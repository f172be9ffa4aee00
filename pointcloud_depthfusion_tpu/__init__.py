"""pointcloud_depthfusion_tpu — a TPU-native RGB-D point-cloud depth-fusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
MMM-Jasmin/PointCloud-DepthFusion smart-mirror pipeline (reference:
/root/reference): synchronized color+depth framesets from two or more RGB-D
cameras are filtered, deprojected into point clouds, continuously registered
(right→left rigid transform via a voxelized-GICP solver), merged, and rendered
through a virtual camera into a fused RGB image.

Design principles (TPU-first, not a CUDA port):
  * Dense fixed-shape tensors with validity masks everywhere — no stream
    compaction, no ragged point counts (replaces the reference's
    compactor.cuh + mask_count machinery).
  * One jitted XLA program per frame-pair: the whole fusion hot path
    (reference fusion_node.cpp:700-811) is a single fused computation.
  * Deterministic z-buffering by scatter-min over packed keys (fixes the
    reference's benign z-buffer race, kernels.cu:264-273).
  * Registration as a fixed-iteration `lax.scan` Gauss-Newton loop with
    masked convergence — replaces FastVGICPCuda.
  * Multi-camera scale-out via `jax.sharding.Mesh` + shard_map with ICI
    collectives (min-reduction of packed z-buffers) — replaces DDS fan-in.
"""

__version__ = "0.1.0"

from pointcloud_depthfusion_tpu.core.camera import (  # noqa: F401
    Distortion,
    Extrinsics,
    Intrinsics,
)
from pointcloud_depthfusion_tpu.core.frameset import Frameset  # noqa: F401
