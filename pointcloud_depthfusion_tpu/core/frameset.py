"""Frameset: one synchronized depth+color frame pair with calibration.

TPU-native equivalent of the reference's Frameset/DepthFrame/ColorFrame device
buffer objects (pointcloud_processing/src/frameset.cpp, depth_frame.cpp,
color_frame.cpp) and of the DepthFrameset wire message
(camera_interfaces/msg/DepthFrameset.msg:1-8).

Where the reference manages raw CUDA buffers plus host/device intrinsics
copies, here a Frameset is an immutable pytree of dense arrays — XLA owns all
memory, and the whole per-frame pipeline consumes/produces Framesets inside a
single jitted program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_depthfusion_tpu.core.camera import Extrinsics, Intrinsics

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Frameset:
    """A depth (uint16) + color (uint8 RGB) frame pair with calibration.

    ``depth`` is the depth image aligned to the color camera (the reference
    default: rs2::align to color, realsense.cpp:373-376); when carrying an
    unaligned depth image, ``depth_intrinsics``/``depth_to_color`` describe it
    and ops/align.py produces the aligned version.

    ``timestamp`` is seconds (float64 on host, float32 on device) — the
    capture time used for cross-camera pairing.
    """

    depth: Array  # (H, W) uint16
    color: Array  # (H, W, 3) uint8
    depth_intrinsics: Intrinsics
    color_intrinsics: Intrinsics
    depth_to_color: Extrinsics
    depth_scale: Array  # scalar, meters per LSB
    timestamp: Array  # scalar, seconds

    @staticmethod
    def create(
        depth,
        color,
        color_intrinsics: Intrinsics,
        depth_intrinsics: Optional[Intrinsics] = None,
        depth_to_color: Optional[Extrinsics] = None,
        depth_scale: float = 0.001,
        timestamp: float = 0.0,
    ) -> "Frameset":
        """``timestamp`` is rebased to a process-wide epoch before the f32
        device cast: raw epoch-scale seconds (~1.7e9) have >60 ms f32
        quantization — far coarser than the 17 ms pairing gate — while the
        epoch offset keeps sub-ms precision for hours (f32 quantum 0.24 ms
        at offset 3600 s). The same clock-rebase idea as the reference's
        system-time restamping (realsense.cpp:424-431). Host-side pairing
        uses HostFrameset's float64 stamps and is unaffected; recover an
        absolute time with :func:`absolute_stamp`."""
        depth = jnp.asarray(depth, jnp.uint16)
        color = jnp.asarray(color, jnp.uint8)
        timestamp = rebase_stamp(float(timestamp))
        if depth_intrinsics is None:
            # Aligned framesets share the color intrinsics
            # (realsense.cpp:670-680: depth intrinsics = color stream profile
            # when aligned).
            depth_intrinsics = color_intrinsics
        if depth_to_color is None:
            depth_to_color = Extrinsics.identity()
        return Frameset(
            depth=depth,
            color=color,
            depth_intrinsics=depth_intrinsics,
            color_intrinsics=color_intrinsics,
            depth_to_color=depth_to_color,
            depth_scale=jnp.asarray(depth_scale, jnp.float32),
            timestamp=jnp.asarray(timestamp, jnp.float32),
        )

    @property
    def height(self) -> int:
        return self.depth.shape[0]

    @property
    def width(self) -> int:
        return self.depth.shape[1]

    def depth_metric(self) -> Array:
        """Depth in meters, float32."""
        return self.depth.astype(jnp.float32) * self.depth_scale

    def to_host(self) -> "HostFrameset":
        return HostFrameset(
            depth=np.asarray(self.depth),
            color=np.asarray(self.color),
            timestamp=absolute_stamp(float(self.timestamp)),
            depth_scale=float(self.depth_scale),
        )


@dataclasses.dataclass
class HostFrameset:
    """Host-side (numpy) frameset used by the IO feeder before device_put.

    ``timestamp`` stays a float64 absolute time — all pairing math
    (ApproximateTimePairer's 17 ms gate) runs on these host stamps, never on
    the f32 device copies."""

    depth: np.ndarray  # (H, W) uint16
    color: np.ndarray  # (H, W, 3) uint8
    timestamp: float
    depth_scale: float = 0.001


# -- device timestamp epoch ----------------------------------------------
#
# Device stamps are f32; storing raw epoch seconds would quantize to >60 ms.
# All Frameset stamps are offsets from this process-wide epoch, set by the
# first frameset (and rebased if a stamp arrives far outside the current
# window, e.g. synthetic 0-based streams followed by wall-clock streams).

_stamp_epoch: Optional[float] = None
_REBASE_LIMIT_S = 1.0e6  # offsets beyond this lose sub-ms f32 precision


def rebase_stamp(timestamp: float) -> float:
    """Absolute seconds → f32-safe offset from the process epoch."""
    global _stamp_epoch
    if _stamp_epoch is None or abs(timestamp - _stamp_epoch) > _REBASE_LIMIT_S:
        _stamp_epoch = timestamp
    return timestamp - _stamp_epoch


def absolute_stamp(offset: float) -> float:
    """Inverse of :func:`rebase_stamp` (float64 on host)."""
    return offset + (_stamp_epoch or 0.0)


def stamp_epoch() -> Optional[float]:
    return _stamp_epoch
