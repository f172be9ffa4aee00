"""Mock ``pyrealsense2`` implementing the API surface the live-capture
bridge (io/realsense_host.py) uses, with librealsense-faithful semantics:

  * context/device enumeration with per-device serials and depth scale;
  * config stream validation (the real SDK raises at pipeline.start when a
    requested (stream, size, format, fps) combination is unsupported);
  * pipeline.start → profile exposing the device and the color video
    stream profile's intrinsics (width/height/fx/fy/ppx/ppy/model/coeffs,
    rs2 distortion enum VALUES);
  * frames with millisecond HARDWARE-clock timestamps on their own epoch
    (far from the system clock — exercising the bridge's rebase);
  * align-to-color (marks depth aligned; sizes follow the color stream);
  * temporal_filter with the rs2 default persistence blend
    (y = α·x + (1−α)·prev, α=0.4 — realsense.cpp:398-404 runs exactly
    this filter in the reference hot loop);
  * wait_for_frames raising RuntimeError once the scripted stream is
    exhausted (the SDK's timeout behavior).

Install with ``sys.modules["pyrealsense2"] = tests.mock_pyrealsense2``
(or monkeypatch.setitem) BEFORE the bridge imports it. Reset scripted
devices between tests via :func:`_reset`.
"""

from __future__ import annotations

import numpy as np

# -- enums (values mirror the real SDK where the bridge depends on them) ---


class camera_info:
    serial_number = "serial_number"
    name = "name"


class stream:
    depth = "depth"
    color = "color"


class format:  # noqa: A001 - mirrors the rs2 module attribute
    z16 = "z16"
    rgb8 = "rgb8"


class distortion:
    none = 0
    modified_brown_conrady = 1
    inverse_brown_conrady = 2
    ftheta = 3
    brown_conrady = 4
    kannala_brandt4 = 5


# -- scripted device registry ----------------------------------------------

# Tests populate this (list of _MockDevice) before constructing context().
_DEVICES: list = []


def _reset() -> None:
    del _DEVICES[:]


def add_device(**kwargs) -> "_MockDevice":
    dev = _MockDevice(**kwargs)
    _DEVICES.append(dev)
    return dev


class _MockDevice:
    """One scripted camera.

    ``supported``: set of (stream, w, h, fmt, fps) tuples the device
    accepts, or None to accept anything. ``n_frames``: frames produced
    before wait_for_frames times out. ``hw_epoch_ms``: hardware-clock
    epoch of frame 0 (deliberately NOT the system clock).
    """

    def __init__(
        self,
        serial: str = "000000000000",
        depth_scale: float = 0.001,
        supported=None,
        n_frames: int = 64,
        hw_epoch_ms: float = 55_000.0,
        fps: float = 30.0,
        seed: int = 0,
        distortion_model: int = distortion.inverse_brown_conrady,
        coeffs=(-0.057, 0.068, 0.0002, 0.0005, -0.022),
    ):
        self._serial = serial
        self._depth_scale = depth_scale
        self.supported = supported
        self.n_frames = n_frames
        self.hw_epoch_ms = hw_epoch_ms
        self.fps = fps
        self.seed = seed
        self.distortion_model = distortion_model
        self.coeffs = list(coeffs)
        self.frames_served = 0

    def get_info(self, key):
        if key == camera_info.serial_number:
            return self._serial
        if key == camera_info.name:
            return "Mock RealSense"
        raise ValueError(key)

    def first_depth_sensor(self):
        return _DepthSensor(self._depth_scale)

    # frame synthesis -------------------------------------------------------
    def render(self, i: int, dsize, csize):
        dw, dh = dsize
        cw, ch = csize
        rng = np.random.default_rng(self.seed * 100003 + i)
        yy = np.linspace(0, 1, dh, dtype=np.float32)[:, None]
        xx = np.linspace(0, 1, dw, dtype=np.float32)[None, :]
        depth = (800 + 600 * yy + 200 * xx + rng.normal(0, 2, (dh, dw))).astype(
            np.uint16
        )
        color = (
            (np.stack(np.broadcast_arrays(255 * yy, 255 * xx, 0 * xx + 40 + i), -1))
            .astype(np.uint8)
            .reshape(ch, cw, 3)
            if (dw, dh) == (cw, ch)
            else rng.integers(0, 255, (ch, cw, 3), dtype=np.uint8)
        )
        ts_ms = self.hw_epoch_ms + i * 1000.0 / self.fps
        return depth, color, ts_ms


class _DepthSensor:
    def __init__(self, scale: float):
        self._scale = scale

    def get_depth_scale(self) -> float:
        return self._scale


class context:
    def query_devices(self):
        return list(_DEVICES)


class config:
    def __init__(self):
        self.serial = None
        self.streams = {}

    def enable_device(self, serial: str):
        self.serial = serial

    def enable_stream(self, s, w, h, fmt, fps):
        self.streams[s] = (int(w), int(h), fmt, int(fps))


# -- frames -----------------------------------------------------------------


class _Frame:
    def __init__(self, data, aligned: bool = False):
        self._data = data
        self.aligned = aligned

    def __bool__(self):
        return self._data is not None

    def get_data(self):
        return self._data


class _Frames:
    def __init__(self, depth: _Frame, color: _Frame, ts_ms: float):
        self._depth = depth
        self._color = color
        self._ts_ms = ts_ms

    def get_depth_frame(self):
        return self._depth

    def get_color_frame(self):
        return self._color

    def get_timestamp(self) -> float:
        return self._ts_ms


class _VideoIntrinsics:
    pass


class _VideoStreamProfile:
    def __init__(self, intr: _VideoIntrinsics):
        self._intr = intr

    def as_video_stream_profile(self):
        return self

    def get_intrinsics(self):
        return self._intr


class _Profile:
    def __init__(self, device: _MockDevice, cfg: config):
        self._device = device
        self._cfg = cfg

    def get_device(self):
        return self._device

    def get_stream(self, s):
        w, h, _fmt, _fps = self._cfg.streams[s]
        intr = _VideoIntrinsics()
        intr.width, intr.height = w, h
        # fx/fy proportional to size like a real sensor's calibration
        intr.fx = 0.74 * w
        intr.fy = 0.74 * w
        intr.ppx = w / 2 + 3.7
        intr.ppy = h / 2 - 2.1
        intr.model = self._device.distortion_model
        intr.coeffs = list(self._device.coeffs)
        return _VideoStreamProfile(intr)


class pipeline:
    def __init__(self, ctx: context):
        self._ctx = ctx
        self._device: _MockDevice | None = None
        self._cfg: config | None = None
        self._started = False

    def start(self, cfg: config) -> _Profile:
        devices = self._ctx.query_devices()
        if cfg.serial:
            matches = [
                d for d in devices
                if d.get_info(camera_info.serial_number) == cfg.serial
            ]
            if not matches:
                raise RuntimeError("No device connected")
            device = matches[0]
        else:
            if not devices:
                raise RuntimeError("No device connected")
            device = devices[0]
        # The real SDK resolves the config at start and raises when a
        # requested profile is unsupported.
        if device.supported is not None:
            for s, (w, h, fmt, fps) in cfg.streams.items():
                if (s, w, h, fmt, fps) not in device.supported:
                    raise RuntimeError(
                        f"Couldn't resolve requests: {s} {w}x{h} {fmt}@{fps}"
                    )
        self._device = device
        self._cfg = cfg
        self._started = True
        return _Profile(device, cfg)

    def wait_for_frames(self, timeout_ms: int = 5000) -> _Frames:
        if not self._started:
            raise RuntimeError("pipeline not started")
        dev = self._device
        if dev.frames_served >= dev.n_frames:
            raise RuntimeError(
                f"Frame didn't arrive within {timeout_ms}"
            )
        dw, dh, _f, _r = self._cfg.streams[stream.depth]
        cw, ch, _f2, _r2 = self._cfg.streams[stream.color]
        depth, color, ts = dev.render(dev.frames_served, (dw, dh), (cw, ch))
        dev.frames_served += 1
        return _Frames(_Frame(depth), _Frame(color), ts)

    def stop(self):
        self._started = False


class align:
    def __init__(self, target):
        if target != stream.color:
            raise ValueError("mock supports align-to-color only")
        self.processed = 0

    def process(self, frames: _Frames) -> _Frames:
        self.processed += 1
        d = frames.get_depth_frame()
        dd = d.get_data()
        c = frames.get_color_frame().get_data()
        if dd is not None and c is not None and dd.shape != c.shape[:2]:
            # Align resamples depth into the color frame's geometry; a
            # nearest resize is enough for the mock's purposes.
            ch, cw = c.shape[:2]
            yi = (np.arange(ch) * dd.shape[0] // ch)[:, None]
            xi = (np.arange(cw) * dd.shape[1] // cw)[None, :]
            dd = dd[yi, xi]
        return _Frames(
            _Frame(dd, aligned=True), frames.get_color_frame(),
            frames.get_timestamp(),
        )


class temporal_filter:
    """rs2 temporal filter: EMA with the SDK default alpha 0.4."""

    def __init__(self, alpha: float = 0.4):
        self.alpha = alpha
        self._prev = None
        self.processed = 0

    def process(self, frame: _Frame) -> _Frame:
        self.processed += 1
        x = np.asarray(frame.get_data(), np.float32)
        if self._prev is None or self._prev.shape != x.shape:
            y = x
        else:
            y = self.alpha * x + (1.0 - self.alpha) * self._prev
        self._prev = y
        return _Frame(y.astype(np.uint16), aligned=frame.aligned)
