"""N-camera rig fusion node: streaming ingestion + continuous calibration.

The node tier for the BASELINE stretch config (4-8 camera rig fusion):
generalizes the two-camera FusionNodeApp/RegistrationNodeApp pair to N
cameras the same way the compute tier generalizes fuse() to rig_fuse —
one :class:`~...io.feeder.RigFeeder` ingests all cameras (N-way
ApproximateTime gate, one stacked — optionally camera-sharded — upload),
one ``rig_fuse``/``rig_fuse_sharded`` program renders, and a periodic
adjacent-pair GICP sweep keeps the rig calibrated while it streams
(the N-camera analogue of the reference's 0.5 Hz registration service,
registration_node.cpp:272-461, with its warm-start and fitness-gating
discipline applied per pair).

Calibration model: ``cam_to_virtual[i]`` maps camera i points into the
virtual/output frame. The registration sweep solves the N-1 adjacent
relative transforms T_i (camera i+1 → camera i), gates each solve on
fitness, composes the accepted chain from camera 0
(P_0 = I, P_{i+1} = P_i·T_i), and re-anchors
``cam_to_virtual[i] = cam_to_virtual[0]·P_i`` — camera 0 plays the
reference's "left camera" role as the fixed frame.
"""

from __future__ import annotations

import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.fusion.pipeline import FusionConfig
from pointcloud_depthfusion_tpu.io.feeder import FramesetSource, RigFeeder
from pointcloud_depthfusion_tpu.utils.profiling import FpsCounter


class RigFusionNodeApp:
    """Streaming N-camera fusion with optional continuous calibration.

    Args:
      sources: one FramesetSource per camera.
      intrinsics: shared Intrinsics or per-camera sequence (heterogeneous
        rigs — width/height must agree, like ``rig_fuse``).
      initial_cam_to_virtual: (N, 4, 4) camera→virtual transforms (the
        persisted/CAD calibration guess; the reference loads the same from
        transform.txt, registration_node.cpp:742-833). Refined in place by
        the registration sweep when ``registration_every`` > 0.
      mesh: optional camera-sharded ``jax.sharding.Mesh`` — selects
        ``rig_fuse_sharded`` and camera-sharded uploads.
      registration_every: run one adjacent-pair sweep every K fused
        frames (0 disables). Each pair runs its own full
        :class:`~...registration.pipeline.RegistrationPipeline` — the
        proven 2-camera service (cold annealing schedule, warm starts,
        fitness gating, guess reset) applied per adjacent pair, so a rig
        calibrates from scratch exactly like the reference's left/right
        pair does. A gated/diverged pair keeps its previous transform
        (discard_transform semantics, registration_node.cpp:363-393).
      reg_settings: RegistrationSettings shared by the pair pipelines.
        The default disables the STEREO angle gate (angle_gate=False): a
        converging rig's correct pair solves carry toe-in yaw that the
        reference's near-parallel |euler_y| < 2° prior would discard.
      registration_async: run sweeps on a background thread (default) —
        registration is a separate service in the reference, never in the
        fusion hot path; a due sweep is SKIPPED while one is in flight.
        False runs sweeps inline (deterministic tick counts).
    """

    def __init__(
        self,
        sources: Sequence[FramesetSource],
        intrinsics,
        initial_cam_to_virtual: np.ndarray,
        config: Optional[FusionConfig] = None,
        mesh=None,
        axis: str = "cam",
        pack_color: bool = True,
        lifespan_s: Optional[float] = None,
        registration_every: int = 0,
        reg_settings=None,
        registration_async: bool = True,
    ):
        from pointcloud_depthfusion_tpu.parallel.mesh import (  # noqa: PLC0415
            rig_fuse,
            rig_fuse_sharded,
        )

        n = len(sources)
        self.n_cameras = n
        self.config = config or FusionConfig.create(
            vertical_image=False, mirror_image=False,
            filter_fused_color=False,
            # Image-only resolve on single-chip; the camera-sharded merge
            # REQUIRES per-device min-z (rig_fuse_sharded raises on
            # emit_zbuf=False rather than silently ignoring it).
            emit_zbuf=mesh is not None,
        )
        self.intrinsics = intrinsics
        self.registration_every = registration_every
        # Async sweeps match the reference architecture (registration is a
        # SEPARATE 0.5 Hz service, never in the fusion hot path — and this
        # repo's own 2-camera RegistrationNodeApp spins its own thread):
        # N-1 sequential pipeline ticks take ~0.2 s each warm and seconds
        # cold, which would stall the streaming loop for whole frames.
        # When a sweep is due but one is still running, the new one is
        # SKIPPED (latest-wins cadence, like the reference's one-shot
        # re-subscribe). registration_async=False keeps the sweep inline
        # (deterministic tick counts for tests/offline calibration runs).
        self.registration_async = registration_async
        self._sweep_thread = None
        self.cam_to_virtual = np.asarray(
            initial_cam_to_virtual, np.float32
        ).reshape(n, 4, 4).copy()
        self._pair_pipes: Optional[list] = None
        self.reg_settings = reg_settings
        # True once load_calibration succeeded: pair pipelines then
        # warm-start from the loaded transforms instead of cold-annealing
        # (which would clobber them on the first sweep).
        self._calibration_trusted = False
        if registration_every:
            self._ensure_pair_pipes()

        self.feeder = RigFeeder(
            sources, mesh=mesh, axis=axis, pack_color=pack_color,
            lifespan_s=lifespan_s,
        )
        if mesh is not None:
            self._fuse = rig_fuse_sharded(
                mesh, intrinsics, self.fused_intrinsics, self.config,
                axis=axis,
            )
        else:
            self._fuse = rig_fuse(
                intrinsics, self.fused_intrinsics, self.config
            )
        self._fused_subs: List[Callable[[np.ndarray, List[float]], None]] = []
        self._transform_subs: List[Callable[[np.ndarray], None]] = []
        self.fps_counter = FpsCounter(name="rig_fusion/fps")
        self.frames_processed = 0
        self.registration_ticks = 0

    def _intr_at(self, i: int) -> Intrinsics:
        if isinstance(self.intrinsics, Intrinsics):
            return self.intrinsics
        return self.intrinsics[i]

    def _ensure_pair_pipes(self) -> list:
        """Build the adjacent-pair registration pipelines on first use
        (``registration_tick`` works even when ``registration_every=0``
        and the caller drives calibration on its own cadence)."""
        if self._pair_pipes is None:
            from pointcloud_depthfusion_tpu.registration.pipeline import (  # noqa: PLC0415
                RegistrationPipeline,
                RegistrationSettings,
            )

            if self.reg_settings is None:
                # angle_gate=False: the Euler gate encodes the reference's
                # STEREO prior (near-parallel cameras, |euler_y| < 2°). A
                # converging rig's adjacent pairs have toe-in yaw by
                # construction — with the gate on, every correct solve is
                # discarded and the identity start transforms collapse
                # cam_to_virtual onto camera 0 on the first sweep. The
                # fitness-regression gate (the half that generalizes to
                # rigs) stays on via discard_transform.
                self.reg_settings = RegistrationSettings(
                    resolution=0.02, voxelsize=0.01, initial_resolution=0.12,
                    resolution_step=0.05, max_iterations=48,
                    angle_gate=False,
                )
            # One full 2-camera registration service per adjacent pair:
            # pair i refines T_i (camera i+1 → camera i). A direct
            # fine-resolution solve is NOT a substitute — without the
            # pipeline's coarse→fine annealing the plane-dominated
            # synthetic scene slides ~0.1 m in-plane at equal fitness
            # (measured); the annealed pipeline lands at ~2 mm.
            self._pair_pipes = [
                RegistrationPipeline(
                    self._intr_at(i), self._intr_at(i + 1), self.reg_settings
                )
                for i in range(self.n_cameras - 1)
            ]
            if self._calibration_trusted:
                self._seed_pair_pipes()
        return self._pair_pipes

    def _seed_pair_pipes(self) -> None:
        """Warm-start each pair pipeline from the CURRENT cam_to_virtual:
        without the seed, the first registration sweep cold-anneals from
        identity and clobbers a loaded calibration (the reference refines
        a loaded transform, it never discards it —
        registration_node.cpp:742-833). Only called for TRUSTED (loaded)
        calibrations; a rough construction-time guess still cold-anneals."""
        if not self._pair_pipes:
            return
        c2v = self.cam_to_virtual.astype(np.float64)
        for i, pipe in enumerate(self._pair_pipes):
            rel = np.linalg.inv(c2v[i]) @ c2v[i + 1]
            pipe.seed(rel.astype(np.float32))

    @property
    def fused_intrinsics(self) -> Intrinsics:
        from pointcloud_depthfusion_tpu.core.camera import (  # noqa: PLC0415
            fused_virtual_intrinsics,
        )

        ref = (
            self.intrinsics
            if isinstance(self.intrinsics, Intrinsics)
            else self.intrinsics[0]
        )
        return fused_virtual_intrinsics(ref, self.config.vertical_image)

    def subscribe_fused(
        self, cb: Callable[[np.ndarray, List[float]], None]
    ) -> None:
        """``cb(image (Hf, Wf, 3) u8, per-camera host timestamps)``."""
        self._fused_subs.append(cb)

    def subscribe_transforms(self, cb: Callable[[np.ndarray], None]) -> None:
        """``cb(cam_to_virtual (N, 4, 4))`` after each accepted sweep."""
        self._transform_subs.append(cb)

    # -- calibration sweep -------------------------------------------------

    def registration_tick(self, batch) -> np.ndarray:
        """One adjacent-pair sweep on ``batch``; returns cam_to_virtual.

        Pair i's RegistrationPipeline ticks on (depth_i, depth_{i+1}) —
        annealing on early ticks, warm-started and fitness-gated after —
        and the accepted chain re-anchors every camera to camera 0's
        (fixed) transform: P_0 = I, P_{i+1} = P_i·T_i,
        cam_to_virtual[i] = cam_to_virtual[0]·P_i.
        """
        rel = []
        for i, pipe in enumerate(self._ensure_pair_pipes()):
            fl = batch.host_frames[i]
            fr = batch.host_frames[i + 1]
            # Per-FRAME depth scales: the settings' 0.001 default is only a
            # fallback — a rig source at a different m/LSB would otherwise
            # deproject its calibration clouds at the wrong scale while
            # fusion (which honors RigBatch.depth_scale) stays correct.
            rel.append(np.asarray(
                pipe.tick(fl.depth, fr.depth,
                          depth_scale_left=fl.depth_scale,
                          depth_scale_right=fr.depth_scale),
                np.float32,
            ))
        # Compose into a NEW array and swap the reference atomically: the
        # sweep may run on the background registration thread while
        # process_batch reads cam_to_virtual — per-row in-place updates
        # would let a frame fuse with a half-updated chain.
        new = self.cam_to_virtual.copy()
        p = np.eye(4, dtype=np.float32)
        for i in range(self.n_cameras - 1):
            p = p @ rel[i]
            new[i + 1] = new[0] @ p
        self.cam_to_virtual = new
        self.registration_ticks += 1
        for cb in self._transform_subs:
            cb(self.cam_to_virtual.copy())
        return self.cam_to_virtual

    # -- calibration persistence -------------------------------------------

    def save_calibration(self, path: str) -> None:
        """Persist cam_to_virtual as whitespace text ((4·N, 4) stacked
        4×4s) — the N-camera generalization of the reference's
        transform.txt (registration_node.cpp:742-833; the 2-camera
        pipeline's save_transform_file uses the same format for one)."""
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savetxt(path, self.cam_to_virtual.reshape(-1, 4).astype(np.float64))

    def load_calibration(self, path: str) -> bool:
        """Load a persisted calibration; returns False (state untouched)
        on any failure — the identity-fallback discipline of the
        reference's loadTransform."""
        try:
            m = np.loadtxt(path).reshape(self.n_cameras, 4, 4)
        except Exception:
            return False
        if not np.all(np.isfinite(m)):
            return False
        self.cam_to_virtual = m.astype(np.float32)
        # Registration sweeps must REFINE the loaded calibration, not
        # re-derive it: seed any (current or future) pair pipelines.
        self._calibration_trusted = True
        self._seed_pair_pipes()
        return True

    # -- streaming loop ----------------------------------------------------

    def process_batch(self, batch) -> np.ndarray:
        img = self._fuse(
            batch.depth, batch.color, batch.depth_scale,
            jnp.asarray(self.cam_to_virtual),
        )
        out = np.asarray(img)
        for cb in self._fused_subs:
            cb(out, batch.timestamps)
        self.frames_processed += 1
        msg = self.fps_counter.tick()
        if msg:
            print(msg, flush=True)
        return out

    def _maybe_sweep(self, batch) -> None:
        """Kick (or run) one calibration sweep for ``batch``."""
        if not self.registration_async:
            self.registration_tick(batch)
            return
        import threading  # noqa: PLC0415

        if self._sweep_thread is not None and self._sweep_thread.is_alive():
            return  # latest-wins: a sweep is still running, skip this one
        # host_frames are host-side numpy — safe to hand to the worker
        # while the streaming loop moves on to newer batches.
        self._sweep_thread = threading.Thread(
            target=self.registration_tick, args=(batch,), daemon=True
        )
        self._sweep_thread.start()

    def _join_sweep(self, timeout: float = 60.0) -> None:
        t = self._sweep_thread
        if t is not None and t.is_alive():
            t.join(timeout=timeout)

    def run(self, max_frames: Optional[int] = None) -> int:
        """Stream until the sources end (or ``max_frames``); returns the
        number of fused frames. Any in-flight async sweep is joined before
        returning, so save_calibration at exit sees the final chain."""
        done = 0
        with self.feeder as feeder:
            for batch in feeder:
                if (
                    self.registration_every
                    and done % self.registration_every == 0
                ):
                    self._maybe_sweep(batch)
                self.process_batch(batch)
                done += 1
                if max_frames is not None and done >= max_frames:
                    break
        self._join_sweep()
        return done

    def stop(self) -> None:
        self.feeder.stop()
        self._join_sweep(timeout=5.0)


def main() -> None:
    """Standalone N-camera rig demo: synthetic rig → calibrate → fuse → PNGs.

    Run: ``python -m pointcloud_depthfusion_tpu.nodes.rig_node
    [--cameras N] [--frames N] [--cpu] [--out DIR]``.
    """
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("--cameras", type=int, default=4)
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--width", type=int, default=424)
    parser.add_argument("--height", type=int, default=240)
    parser.add_argument("--out", default="/tmp/pdf_rig_demo")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--registration-every", type=int, default=4)
    parser.add_argument("--calibration", default="",
                        help="calibration text file: loaded at start when "
                        "present, saved at exit (the reference's "
                        "load_transform/save_transform workflow)")
    parser.add_argument("--render-mode", default="",
                        choices=["", "tiled", "exact", "packed"])
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import json
    import os

    from pointcloud_depthfusion_tpu.io.artifacts import save_png
    from pointcloud_depthfusion_tpu.io.feeder import SyntheticSource
    from pointcloud_depthfusion_tpu.io.synthetic import (
        SyntheticScene,
        rig_arc_poses,
    )

    n = args.cameras
    w, h = args.width, args.height
    fx = 631.0 * w / 848.0
    intr = Intrinsics.create(w, h, fx=fx, fy=fx, ppx=w / 2, ppy=h / 2)
    scene = SyntheticScene()
    # Converging arc (37.5 deg/m toe-in): adjacent frusta overlap, which
    # the per-pair registration sweep needs.
    poses = rig_arc_poses(n, span=0.8, toe_in_deg_per_m=37.5)
    sources = [
        SyntheticSource(scene, intr, poses[i], seed=i + 1,
                        depth_noise_std=0.002)
        for i in range(n)
    ]
    mode = args.render_mode or ("exact" if args.cpu else "tiled")
    config = FusionConfig.create(
        vertical_image=False, mirror_image=False, filter_fused_color=False,
        emit_zbuf=False, render_mode=mode,
    )
    app = RigFusionNodeApp(
        sources, intr, np.stack(poses),
        config=config,
        registration_every=args.registration_every,
    )
    os.makedirs(args.out, exist_ok=True)
    idx = [0]

    def save(img, stamps):
        save_png(os.path.join(args.out, f"rig_fused_{idx[0]:04d}.png"), img)
        idx[0] += 1

    app.subscribe_fused(save)
    if args.calibration and app.load_calibration(args.calibration):
        print(f"loaded calibration from {args.calibration}")
    t0 = time.perf_counter()
    done = app.run(max_frames=args.frames)
    if args.calibration:
        app.save_calibration(args.calibration)
    print(json.dumps({
        "frames": done,
        "cameras": n,
        "wall_s": round(time.perf_counter() - t0, 2),
        "registration_ticks": app.registration_ticks,
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
