"""Host-side streaming fabric: sources, temporal pairing, async device feed.

This is the TPU-native replacement for the reference's ROS2/DDS transport
(SURVEY.md §2.8): typed topics become Python callbacks/queues, the
ApproximateTime message filter becomes :class:`ApproximateTimePairer`, and
the double-buffered capture loop (camera_node.cpp:315-333) becomes
:class:`DeviceFeeder`, a background thread that uploads the next host frame
pair while the device computes on the current one.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from typing import Callable, Deque, Iterator, List, Optional, Tuple

import jax
import numpy as np

from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.core.frameset import Frameset, HostFrameset
from pointcloud_depthfusion_tpu.io.synthetic import SyntheticScene


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------


class FramesetSource:
    """A stream of HostFramesets (the capture-device abstraction).

    Implementations: SyntheticSource (parametric scene), RecordedSource
    (npz dataset, io/recorded.py). A real-sensor backend would slot in here;
    live USB capture is out of scope on TPU hosts (SURVEY.md §2.7 item 6).
    """

    def next_frame(self) -> Optional[HostFrameset]:
        raise NotImplementedError

    @property
    def intrinsics(self) -> Intrinsics:
        raise NotImplementedError


class SyntheticSource(FramesetSource):
    """Deterministic synthetic stream with optional per-frame camera motion
    and timestamp jitter (models real sensors' non-ideal cadence)."""

    def __init__(
        self,
        scene: SyntheticScene,
        intr: Intrinsics,
        world_from_cam: np.ndarray,
        fps: float = 30.0,
        depth_noise_std: float = 0.002,
        hole_fraction: float = 0.01,
        timestamp_jitter_s: float = 0.0,
        motion: Optional[Callable[[int], np.ndarray]] = None,
        seed: int = 0,
        start_time: float = 0.0,
    ):
        self.scene = scene
        self._intr = intr
        self.pose = np.asarray(world_from_cam)
        self.fps = fps
        self.depth_noise_std = depth_noise_std
        self.hole_fraction = hole_fraction
        self.jitter = timestamp_jitter_s
        self.motion = motion
        self.rng = np.random.default_rng(seed)
        self.frame_idx = 0
        self.start_time = start_time

    @property
    def intrinsics(self) -> Intrinsics:
        return self._intr

    def sensor_options(self) -> dict:
        """Source-level options reflected into the parameter tree by
        CameraNode.attach_config (the synthetic sensor's analogue of rs2
        sensor options like laser power / exposure)."""
        return {
            "depth": {
                "depth_noise_std": self.depth_noise_std,
                "hole_fraction": self.hole_fraction,
            },
            "color": {
                "jitter": self.jitter,  # timestamp jitter (s)
            },
        }

    def next_frame(self) -> HostFrameset:
        t = self.start_time + self.frame_idx / self.fps
        if self.jitter > 0:
            t += float(self.rng.normal(0, self.jitter))
        pose = self.motion(self.frame_idx) if self.motion else self.pose
        fs = self.scene.render(
            self._intr,
            pose,
            timestamp=t,
            depth_noise_std=self.depth_noise_std,
            hole_fraction=self.hole_fraction,
            seed=int(self.rng.integers(0, 2**31)),
        )
        self.frame_idx += 1
        return fs


class NativeSyntheticSource(SyntheticSource):
    """SyntheticSource backed by the C++ OpenMP renderer (runtime/): ~17×
    the numpy renderer's throughput (15 ms vs 260 ms at 848×480), bit-exact
    on noise-free frames. Noise/hole patterns use a different (xorshift) RNG
    than numpy — statistically equivalent, not bit-identical."""

    def next_frame(self) -> HostFrameset:
        from pointcloud_depthfusion_tpu.runtime import (  # noqa: PLC0415
            is_available,
            render_scene_native,
        )

        if not is_available():  # pragma: no cover - env without toolchain
            return super().next_frame()
        t = self.start_time + self.frame_idx / self.fps
        if self.jitter > 0:
            t += float(self.rng.normal(0, self.jitter))
        pose = self.motion(self.frame_idx) if self.motion else self.pose
        scene = self.scene
        spheres = np.asarray(
            [
                [s.center[0], s.center[1], s.center[2], s.radius, *s.base_color]
                for s in scene.spheres
            ]
        )
        depth, color = render_scene_native(
            self._intr.width,
            self._intr.height,
            float(self._intr.fx),
            float(self._intr.fy),
            float(self._intr.ppx),
            float(self._intr.ppy),
            np.asarray(pose),
            scene.plane_z,
            spheres,
            scene.checker_period,
            scene.max_depth,
            0.001,
            noise_std=self.depth_noise_std,
            hole_fraction=self.hole_fraction,
            seed=int(self.rng.integers(0, 2**62)),
        )
        self.frame_idx += 1
        return HostFrameset(depth=depth, color=color, timestamp=t, depth_scale=0.001)


# ---------------------------------------------------------------------------
# ApproximateTime pairing
# ---------------------------------------------------------------------------


class ApproximateTimePairer:
    """Pair two timestamped streams, emitting the closest-stamp pairs.

    Semantics follow message_filters ApproximateTime as configured by the
    reference (queue 10, max interval 17 ms, fusion_node.cpp:221-228):
    bounded per-stream queues drop the oldest entry; a pair is emitted when
    the best available match is within ``max_interval_s``, consuming both
    entries and everything older.
    """

    def __init__(self, max_interval_s: float = 0.017, queue_size: int = 10):
        self.max_interval_s = max_interval_s
        self.queue_size = queue_size
        self.queues: Tuple[Deque[HostFrameset], Deque[HostFrameset]] = (
            collections.deque(),
            collections.deque(),
        )
        self.dropped = 0
        self.emitted = 0

    def push(self, stream: int, frame: HostFrameset) -> List[Tuple[HostFrameset, HostFrameset]]:
        """Add a frame; returns zero or more matched pairs."""
        q = self.queues[stream]
        q.append(frame)
        if len(q) > self.queue_size:
            q.popleft()
            self.dropped += 1
        return self._drain()

    def _drain(self) -> List[Tuple[HostFrameset, HostFrameset]]:
        out = []
        qa, qb = self.queues
        while qa and qb:
            # Globally closest pair across both queues (an exhaustive
            # O(|qa|·|qb|) scan per emission — at the configured queue size
            # of 10 that is ≤100 stamp comparisons, far below the cost of
            # one frame; message_filters' incremental pivot algorithm would
            # only matter at much larger queues/rates).
            best = None
            best_dt = None
            for i, fa in enumerate(qa):
                for j, fb in enumerate(qb):
                    dt = abs(fa.timestamp - fb.timestamp)
                    if best_dt is None or dt < best_dt:
                        best_dt = dt
                        best = (i, j)
            if best is None or best_dt is None or best_dt > self.max_interval_s:
                # If queues are saturated with unmatchable data, drop the
                # oldest overall to make progress.
                if len(qa) >= self.queue_size or len(qb) >= self.queue_size:
                    (qa if qa[0].timestamp <= qb[0].timestamp else qb).popleft()
                    self.dropped += 1
                    continue
                break
            i, j = best
            fa, fb = qa[i], qb[j]
            for _ in range(i + 1):
                qa.popleft()
            for _ in range(j + 1):
                qb.popleft()
            self.dropped += i + j
            self.emitted += 1
            out.append((fa, fb))
        return out


# ---------------------------------------------------------------------------
# Async device feeder (double buffering)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class DevicePair:
    left: Frameset
    right: Frameset
    host_left: HostFrameset
    host_right: HostFrameset
    upload_ms: float = 0.0  # H2D time for this pair (the copy_to_gpu stage)
    # Wall clock at enqueue — the QoS-lifespan reference point (a message's
    # age starts when it is published, fusion_node.cpp:183-187).
    enqueue_time: float = 0.0


class DeviceFeeder:
    """Background thread: capture → pair → device_put, one pair ahead.

    The capture/upload of frame N+1 overlaps the device compute of frame N —
    the async analogue of the reference's double-buffered std::async fan-out
    (camera_node.cpp:315-343). ``get()`` blocks for the next ready pair.
    """

    def __init__(
        self,
        source_left: FramesetSource,
        source_right: FramesetSource,
        pairer: Optional[ApproximateTimePairer] = None,
        depth: int = 2,
        device: Optional[jax.Device] = None,
        lifespan_s: Optional[float] = None,
        pack_color: bool = False,
    ):
        """``lifespan_s``: drop pairs that sat in the queue longer than this
        before the consumer asked for them — the QoS 1 s message-lifespan
        semantics of the reference's fused-frame subscriptions
        (fusion_node.cpp:183-187). A stalled consumer then resumes on fresh
        data instead of processing arbitrarily stale frames. None disables
        (pull-paced pipelines where the consumer sets the cadence).

        ``pack_color``: also upload ``Frameset.color_packed`` — the rgb24
        plane packed host-side in this feeder thread (overlapped with
        device compute). Saves the tiled render's per-frame HWC channel
        relayout at the cost of +4 B/px upload."""
        self.source_left = source_left
        self.source_right = source_right
        self.pairer = pairer or ApproximateTimePairer()
        self.device = device
        self.lifespan_s = lifespan_s
        self.pack_color = pack_color
        self.dropped_stale = 0
        self._q: "queue.Queue[Optional[DevicePair]]" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._started = False
        self._ended = False
        self.error: Optional[BaseException] = None

    def _upload(self, host: HostFrameset, intr: Intrinsics) -> Frameset:
        if host.depth.shape != host.color.shape[:2]:
            raise ValueError(
                f"depth {host.depth.shape} / color {host.color.shape[:2]} "
                "size mismatch — the fusion path needs color-aligned depth. "
                "Disable the camera node's decimation filter for composed "
                "fusion (the reference also runs it disabled, "
                "realsense.cpp:393)."
            )
        fs = Frameset.create(
            host.depth,
            host.color,
            intr,
            depth_scale=host.depth_scale,
            timestamp=host.timestamp,
            pack_color=self.pack_color,
        )
        if self.device is not None:
            fs = jax.device_put(fs, self.device)
        return fs

    def _run(self) -> None:
        try:
            while not self._stop.is_set():
                fl = self.source_left.next_frame()
                fr = self.source_right.next_frame()
                if fl is None or fr is None:
                    # Same bounded delivery as the exception path below: a
                    # bare blocking put would pin this thread forever if
                    # the consumer stopped draining a full queue.
                    while not self._stop.is_set():
                        try:
                            self._q.put(None, timeout=0.5)
                            return
                        except queue.Full:
                            continue
                    return
                pairs = []
                pairs += self.pairer.push(0, fl)
                pairs += self.pairer.push(1, fr)
                for hl, hr in pairs:
                    t_up = time.perf_counter()
                    pair = DevicePair(
                        left=self._upload(hl, self.source_left.intrinsics),
                        right=self._upload(hr, self.source_right.intrinsics),
                        host_left=hl,
                        host_right=hr,
                    )
                    # Fence before stamping: device_put only ENQUEUES the
                    # H2D copy, so an unfenced stamp reports dispatch time
                    # (~1 ms) while the real transfer (~100 ms over this
                    # environment's relay) silently lands in the consumer's
                    # first compute stage. Fencing here keeps upload_ms
                    # honest and still overlaps with the consumer — this is
                    # the producer thread, one pair ahead.
                    jax.block_until_ready((pair.left, pair.right))
                    pair.upload_ms = (time.perf_counter() - t_up) * 1e3
                    pair.enqueue_time = time.perf_counter()
                    while not self._stop.is_set():
                        try:
                            self._q.put(pair, timeout=0.1)
                            break
                        except queue.Full:
                            continue
        except Exception as exc:  # propagate end-of-stream instead of hanging get()
            self.error = exc
            # The None sentinel MUST reach the consumer or a later get()
            # with no timeout blocks forever. If the queue stays full, drop
            # a pending pair to make room (we are aborting anyway).
            while not self._stop.is_set():
                try:
                    self._q.put(None, timeout=0.5)
                    return
                except queue.Full:
                    try:
                        self._q.get_nowait()
                    except queue.Empty:
                        pass

    def start(self) -> "DeviceFeeder":
        if not self._started:
            self._thread.start()
            self._started = True
        return self

    def get(self, timeout: Optional[float] = None) -> Optional[DevicePair]:
        """Next synchronized device-resident pair (None = clean end of
        stream). A producer-side failure re-raises HERE — a silently empty
        stream would hide errors like the decimated-depth rejection."""
        if not self._started:
            self.start()
        if self._ended:
            # The producer enqueues ONE sentinel and exits; keep answering
            # None instead of blocking a second end-of-stream get() forever.
            if self.error is not None:
                raise RuntimeError("frameset producer failed") from self.error
            return None
        deadline = (
            None if timeout is None else time.perf_counter() + timeout
        )
        while True:
            # Poll in short slices so an out-of-band stop() (e.g. the
            # viewer-close shutdown hook) unblocks a waiting consumer —
            # stop() drains the queue, so the producer's None sentinel can
            # be lost and a bare blocking get() would hang forever.
            if self._stop.is_set():
                self._ended = True
                return None
            slice_s = 0.2
            if deadline is not None:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    raise queue.Empty
                slice_s = min(slice_s, remaining)
            try:
                pair = self._q.get(timeout=slice_s)
            except queue.Empty:
                continue
            if pair is None:
                self._ended = True
                if self.error is not None:
                    raise RuntimeError(
                        "frameset producer failed"
                    ) from self.error
                return None
            if (
                self.lifespan_s is not None
                and time.perf_counter() - pair.enqueue_time > self.lifespan_s
            ):
                # QoS lifespan expiry: skip the stale pair; the producer is
                # still running, so a fresh one follows.
                self.dropped_stale += 1
                continue
            return pair

    def stop(self) -> None:
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        # stop() can be invoked FROM the producer thread (a frameset
        # subscriber raising through capture() — e.g. the viewer-close
        # shutdown hook); joining the current thread would raise.
        if self._started and self._thread is not threading.current_thread():
            self._thread.join(timeout=2.0)

    def __enter__(self) -> "DeviceFeeder":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    def __iter__(self) -> Iterator[DevicePair]:
        while True:
            pair = self.get()
            if pair is None:
                return
            yield pair
