"""Camera node: frameset acquisition + calibration service.

Equivalent of the reference camera_node (camera_node/src/camera_node.cpp):
wraps a FramesetSource (synthetic/recorded; live capture out of scope on TPU
hosts), serves camera parameters (the GetCameraParameters service,
camera_node.cpp:377-386), publishes framesets and depth images to
subscribers, and reports FPS. Runs pull-based inside a DeviceFeeder or
push-based via :meth:`spin` on a thread.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, List, Optional

import numpy as np

from pointcloud_depthfusion_tpu.core.camera import (
    CameraInfo,
    Extrinsics,
    Intrinsics,
)
from pointcloud_depthfusion_tpu.core.frameset import HostFrameset
from pointcloud_depthfusion_tpu.io.feeder import FramesetSource
from pointcloud_depthfusion_tpu.ops import filters as F
from pointcloud_depthfusion_tpu.utils.profiling import FpsCounter


@dataclasses.dataclass
class CameraParameters:
    """GetCameraParameters response (GetCameraParameters.srv:1-10)."""

    depth_info: CameraInfo
    color_info: CameraInfo
    extrinsic_rotation: np.ndarray  # (9,) column-major
    extrinsic_translation: np.ndarray  # (3,)


class CameraNode(FramesetSource):
    """One camera's acquisition pipeline.

    Also a :class:`FramesetSource` itself (``next_frame`` → :meth:`capture`)
    so composed applications (FusionNodeApp's DeviceFeeder) pull through the
    node and get its rs2-equivalent post-processing — the reference always
    runs the temporal filter inside getFrames (realsense.cpp:398-404), so
    feeding from the raw source would silently skip it.
    """

    def __init__(
        self,
        name: str,
        source: FramesetSource,
        depth_to_color: Optional[Extrinsics] = None,
        fps: float = 30.0,
        temporal_filter: bool = True,
        temporal_alpha: float = 0.4,
        temporal_delta: float = 20.0,
    ):
        self.name = name
        self.source = source
        self.fps = fps
        self.depth_to_color = depth_to_color or Extrinsics.identity()
        self.temporal_filter = temporal_filter
        self.temporal_alpha = temporal_alpha
        self.temporal_delta = temporal_delta
        self._prev_depth: Optional[np.ndarray] = None
        self._frameset_subs: List[Callable[[HostFrameset], None]] = []
        self._depth_subs: List[Callable[[np.ndarray, float], None]] = []
        self.fps_counter = FpsCounter(name=f"{name}/fps")
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    # -- dynamic reconfiguration ------------------------------------------

    def attach_config(self, cfg) -> None:
        """Wire a ConfigTree for dynamic reconfiguration.

        Mirrors the reference's dotted-namespace parameter dispatcher
        (config.cpp:53-169): ``sensor.depth.*`` parameters retune the
        temporal filter, ``fps`` the loop rate, ``debug.*`` the debug flags.
        Call ``cfg.set("sensor.depth.temporal_alpha", 0.5)`` at runtime and
        the node picks it up immediately.
        """
        self.config = cfg
        self.fps = float(cfg.get("fps", self.fps))
        sensor = "sensor.depth."
        self.temporal_filter = bool(
            cfg.get(sensor + "temporal_filter", self.temporal_filter)
        )
        self.temporal_alpha = float(
            cfg.get(sensor + "temporal_alpha", self.temporal_alpha)
        )
        self.temporal_delta = float(
            cfg.get(sensor + "temporal_delta", self.temporal_delta)
        )

        def on_change(key: str, value) -> None:
            if key == "fps":
                self.fps = float(value)
            elif key == sensor + "temporal_filter":
                self.temporal_filter = bool(value)
            elif key == sensor + "temporal_alpha":
                self.temporal_alpha = float(value)
            elif key == sensor + "temporal_delta":
                self.temporal_delta = float(value)

        cfg.on_change(on_change)

    # -- service -----------------------------------------------------------

    def get_camera_parameters(self) -> CameraParameters:
        intr = self.source.intrinsics
        info = CameraInfo.from_intrinsics(intr)
        rot = np.asarray(self.depth_to_color.rotation)
        return CameraParameters(
            depth_info=info,  # aligned: depth shares the color profile
            color_info=info,
            extrinsic_rotation=rot.flatten(order="F"),
            extrinsic_translation=np.asarray(self.depth_to_color.translation),
        )

    # -- topics ------------------------------------------------------------

    def subscribe_frameset(self, cb: Callable[[HostFrameset], None]) -> None:
        self._frameset_subs.append(cb)

    def subscribe_depth(self, cb: Callable[[np.ndarray, float], None]) -> None:
        self._depth_subs.append(cb)

    # -- acquisition --------------------------------------------------------

    @property
    def intrinsics(self) -> Intrinsics:
        return self.source.intrinsics

    def next_frame(self) -> Optional[HostFrameset]:
        """FramesetSource face: one filtered frame (see class docstring)."""
        return self.capture()

    def capture(self) -> Optional[HostFrameset]:
        """Grab one frame, apply the temporal filter (the only active rs2
        post-processing filter, realsense.cpp:398-404), publish."""
        fs = self.source.next_frame()
        if fs is None:
            return None
        if self.temporal_filter:
            fs = self._apply_temporal(fs)
        for cb in self._frameset_subs:
            cb(fs)
        for cb in self._depth_subs:
            cb(fs.depth, fs.timestamp)
        self.fps_counter.tick()
        return fs

    def _apply_temporal(self, fs: HostFrameset) -> HostFrameset:
        # Pure numpy on the capture thread: the device round-trip per frame
        # (H2D+D2H over the relay) costs far more than the EMA itself. Same
        # semantics as ops.filters.temporal_filter (tested equivalent).
        if self._prev_depth is None:
            self._prev_depth = fs.depth
            return fs
        cur = fs.depth.astype(np.float32)
        prev = self._prev_depth.astype(np.float32)
        have_both = (cur > 0) & (prev > 0)
        close = np.abs(cur - prev) <= self.temporal_delta
        out = np.where(
            have_both & close,
            self.temporal_alpha * cur + (1.0 - self.temporal_alpha) * prev,
            cur,
        )
        out = np.where((cur == 0) & (prev > 0), prev, out)
        out = np.clip(np.rint(out), 0, 65535).astype(np.uint16)
        self._prev_depth = out
        return HostFrameset(
            depth=out,
            color=fs.color,
            timestamp=fs.timestamp,
            depth_scale=fs.depth_scale,
        )

    # -- push-mode loop ------------------------------------------------------

    def spin(self, realtime: bool = True, max_frames: Optional[int] = None) -> None:
        period = 1.0 / self.fps
        count = 0
        while not self._stop.is_set():
            t0 = time.perf_counter()
            if self.capture() is None:
                return
            count += 1
            if max_frames is not None and count >= max_frames:
                return
            if realtime:
                dt = time.perf_counter() - t0
                if dt < period:
                    time.sleep(period - dt)

    def start(self, **spin_kw) -> "CameraNode":
        self._thread = threading.Thread(
            target=self.spin, kwargs=spin_kw, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2.0)


def main() -> None:
    """Standalone camera node: stream a synthetic camera and record it.

    The CLI face of the reference camera_node main (--name selects the
    camera, camera_node/src/main.cpp:60-100), adapted to the TPU-host
    reality: the source is synthetic/recorded and the output is a dataset
    file (.npz via io.recorded or .pdfe via io.encoded) instead of DDS
    topics.
    """
    import argparse

    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument("--name", default="camera_left",
                        choices=["camera_left", "camera_right"])
    parser.add_argument("--model", default="D455")
    parser.add_argument("--width", type=int, default=0,
                        help="override preset width")
    parser.add_argument("--height", type=int, default=0)
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--out", default="",
                        help="output dataset (.npz or .pdfe); empty = none")
    parser.add_argument("--fps", type=float, default=0.0)
    args = parser.parse_args()

    import numpy as np  # noqa: PLC0415

    from pointcloud_depthfusion_tpu.core.camera import (  # noqa: PLC0415
        Intrinsics,
        model_preset,
    )
    from pointcloud_depthfusion_tpu.io.feeder import (  # noqa: PLC0415
        NativeSyntheticSource,
        SyntheticSource,
    )
    from pointcloud_depthfusion_tpu.io.synthetic import (  # noqa: PLC0415
        SyntheticScene,
        two_camera_rig,
    )
    from pointcloud_depthfusion_tpu.runtime import is_available  # noqa: PLC0415

    preset = model_preset(args.model)
    w, h = preset["color_size"]
    if args.width:
        w = args.width
    if args.height:
        h = args.height
    fps = args.fps or preset["fps"]
    fx = 631.0 * w / 1280.0
    intr = Intrinsics.create(w, h, fx=fx, fy=fx, ppx=w / 2, ppy=h / 2)
    wl, wr = two_camera_rig()
    pose = wl if args.name == "camera_left" else wr
    src_cls = NativeSyntheticSource if is_available() else SyntheticSource
    source = src_cls(
        SyntheticScene(), intr, pose, fps=fps,
        depth_noise_std=0.002, hole_fraction=0.01,
    )
    node = CameraNode(args.name, source, fps=fps)

    frames = []
    node.subscribe_frameset(frames.append)
    node.spin(realtime=False, max_frames=args.frames)
    msg = node.fps_counter.tick()
    print(f"{args.name}: captured {len(frames)} frames @ {w}x{h}")

    if args.out.endswith(".npz"):
        from pointcloud_depthfusion_tpu.io.recorded import record_dataset  # noqa: PLC0415

        record_dataset(args.out, frames, intr)
        print(f"wrote {args.out}")
    elif args.out.endswith(".pdfe"):
        from pointcloud_depthfusion_tpu.io.encoded import write_encoded_stream  # noqa: PLC0415

        write_encoded_stream(args.out, frames)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
