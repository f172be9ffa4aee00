"""PointCloud: the user-facing colored-cloud container.

API-parity layer for the reference's Pointcloud class
(pointcloud_processing/src/pointcloud.cpp: deproject :100-111, append
:117-129, transform :63-93, project :136-157, copyToHost :163-169). Inside
the fused pipeline clouds stay as raw coordinate planes for speed; this
class packages the same operations for interactive / library use.

Dense fixed-shape semantics: a PointCloud always carries its validity mask;
``append`` concatenates statically (the reference's running-offset D2D
memcpy becomes a free concat).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_depthfusion_tpu.core import geometry as G
from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.core.frameset import Frameset
from pointcloud_depthfusion_tpu.ops import filters as F
from pointcloud_depthfusion_tpu.ops import render as R

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """Colored point cloud with validity mask (flat, fixed shape)."""

    points: Array  # (N, 3) float32
    colors: Array  # (N, 3) uint8
    valid: Array  # (N,) bool

    @staticmethod
    def deproject(
        frameset: Frameset,
        min_depth: float = 0.0,
        max_depth: float = jnp.inf,
        roi=None,
    ) -> "PointCloud":
        """Deproject a frameset into a cloud (Pointcloud::deproject).

        Applies the depth window like Frameset::filterDepth +
        Pointcloud::deproject chained (fusion hot-path semantics).

        Deprojects with ``depth_intrinsics`` — identical to
        ``color_intrinsics`` for aligned framesets (the reference's depth
        intrinsics ARE the color stream profile once rs2::align ran,
        realsense.cpp:670-680), and the geometrically correct choice for a
        frameset still carrying unaligned depth. Colors pair with depth
        pixels by position, which is only meaningful when depth is aligned
        to color — a resolution mismatch is rejected loudly (run
        ops.align.align_depth_to_color first) instead of producing a
        shape-inconsistent cloud.
        """
        depth = frameset.depth
        if depth.shape != frameset.color.shape[:2]:
            raise ValueError(
                f"depth {depth.shape} vs color {frameset.color.shape[:2]}: "
                "PointCloud.deproject pairs colors per pixel, so depth must "
                "be aligned to color (ops.align.align_depth_to_color) first"
            )
        if np.isfinite(max_depth) or min_depth > 0 or roi is not None:
            depth, valid = F.filter_depth(
                depth, frameset.depth_scale, min_depth, max_depth, roi
            )
        else:
            valid = None
        depth_m = depth.astype(jnp.float32) * frameset.depth_scale
        pts, valid = G.deproject(depth_m, frameset.depth_intrinsics, valid)
        return PointCloud(
            points=pts.reshape(-1, 3),
            colors=frameset.color.reshape(-1, 3),
            valid=valid.reshape(-1),
        )

    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> Array:
        """Number of valid points (the reference's mask_count)."""
        return jnp.sum(self.valid, dtype=jnp.int32)

    def transform(self, transform: Array) -> "PointCloud":
        """Rigid transform (Pointcloud::transform)."""
        return dataclasses.replace(
            self,
            points=G.transform_points(self.points, jnp.asarray(transform, jnp.float32)),
        )

    def append(self, other: "PointCloud") -> "PointCloud":
        """Concatenate clouds (Pointcloud::append)."""
        return PointCloud(
            points=jnp.concatenate([self.points, other.points]),
            colors=jnp.concatenate([self.colors, other.colors]),
            valid=jnp.concatenate([self.valid, other.valid]),
        )

    def project(
        self,
        intrinsics: Intrinsics,
        mirror: bool = False,
        mode: str = "exact",
    ) -> Tuple[Array, Array]:
        """Render through a camera with z-buffering (Pointcloud::project).

        Returns (image uint8 (H, W, 3), zbuf float32).

        ``mode``: "exact" (scatter z-buffer; "tiled" aliases here — the
        AoS debug API has no planar fast path and the winner semantics are
        identical) or "packed" (lossy RGB666). Unknown modes raise.
        """
        if mode == "packed":
            return R.project_zbuffer_packed(
                self.points, self.colors, self.valid, intrinsics, mirror
            )
        if mode not in ("exact", "tiled"):
            raise ValueError(
                f"PointCloud.project supports 'exact'/'tiled' or 'packed', "
                f"not {mode!r}"
            )
        return R.project_zbuffer(
            self.points, self.colors, self.valid, intrinsics, mirror
        )

    def to_host(self, compact: bool = True) -> Tuple[np.ndarray, np.ndarray]:
        """Copy to numpy (Pointcloud::copyToHost); ``compact=True`` drops
        invalid points (host-side, where ragged shapes are fine)."""
        pts = np.asarray(self.points)
        cols = np.asarray(self.colors)
        if compact:
            mask = np.asarray(self.valid)
            return pts[mask], cols[mask]
        return pts, cols

    def save_ply(self, path: str) -> None:
        from pointcloud_depthfusion_tpu.io.artifacts import save_ply  # noqa: PLC0415

        pts, cols = self.to_host(compact=True)
        save_ply(path, pts, cols)
