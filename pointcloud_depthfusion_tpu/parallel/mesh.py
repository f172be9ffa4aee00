"""Multi-chip scale-out: camera-parallel rig fusion over a device mesh.

The reference scales by process replication over two Jetsons with DDS/UDP
fan-in (SURVEY.md §2.8). The TPU-native design shards CAMERAS over mesh
devices: each device filters/deprojects/renders its own camera's frameset
into a local z-buffer, and the fused image is a z-buffer MERGE — an
all-reduce **min** over the camera axis riding ICI:

    pmin(zbuf)  →  local winner mask  →  pmin(packed RGB of winners)

Two small collectives (H·W floats + H·W int32) replace the reference's
full-frameset network hop, and ties resolve deterministically exactly like
the single-chip path (ops/render.py).

Also provided: batch (data-parallel) fusion via vmap for many frame-pairs
per step, composable with the camera axis.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pointcloud_depthfusion_tpu.core import geometry as G
from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.fusion.pipeline import FusionConfig
from pointcloud_depthfusion_tpu.ops import filters as F
from pointcloud_depthfusion_tpu.ops import render as R

Array = jax.Array


def make_camera_mesh(n_cameras: Optional[int] = None, axis: str = "cam") -> Mesh:
    """1-D device mesh over the camera axis."""
    from jax.experimental import mesh_utils  # noqa: PLC0415

    devs = jax.devices()
    n = n_cameras or len(devs)
    return Mesh(mesh_utils.create_device_mesh((n,), devs[:n]), (axis,))


def rig_fuse_sharded(
    mesh: Mesh,
    intrinsics: Intrinsics,
    fused_intrinsics: Intrinsics,
    config: FusionConfig,
    axis: str = "cam",
):
    """Build the jitted camera-sharded rig fusion step.

    Returns ``fn(depth (N,H,W) u16, color (N,H,W,3) u8, depth_scale (N,),
    cam_to_virtual (N,4,4)) -> fused image (Hf, Wf, 3) u8`` with the camera
    axis sharded over ``mesh``; the result is replicated.
    """
    n_px = fused_intrinsics.width * fused_intrinsics.height
    zmax = jnp.float32(jnp.finfo(jnp.float32).max)

    def per_camera(depth, color, depth_scale, cam_to_virtual):
        # shard_map gives local shards with a leading axis of size
        # N/num_devices (usually 1).
        def one(depth1, color1, scale1, t1):
            d, valid = F.filter_depth(
                depth1, scale1, config.min_depth, config.max_depth
            )
            x, y, z, valid = G.deproject_planar(
                d.astype(jnp.float32) * scale1, intrinsics, valid
            )
            x, y, z = G.transform_planar(x, y, z, t1)
            idx, z, ok = R.compute_pixel_indices_planar(
                x, y, z, valid, fused_intrinsics, config.mirror_image
            )
            idx = idx.reshape(-1)
            z = z.reshape(-1)
            ok = ok.reshape(-1)
            zbuf = jnp.full((n_px + 1,), zmax, jnp.float32)
            zbuf = zbuf.at[idx].min(jnp.where(ok, z, zmax), mode="drop")
            return zbuf[:n_px], idx, z, ok, color1

        zbufs, idxs, zs, oks, colors = jax.vmap(one)(
            depth, color, depth_scale, cam_to_virtual
        )
        # Merge the local cameras' z-buffers, then the global min over ICI.
        local_z = jnp.min(zbufs, axis=0)
        global_z = jax.lax.pmin(local_z, axis)

        # Winners scatter their packed color; min-reduce resolves ties.
        def one_color(idx, z, ok, color1):
            zwin = jnp.concatenate([global_z, jnp.asarray([zmax])])[idx]
            winner = ok & (z <= zwin)
            packed = jnp.where(
                winner, R.pack_rgb(color1.reshape(-1, 3)), R._INVALID_PACKED
            )
            cbuf = jnp.full((n_px + 1,), R._INVALID_PACKED, jnp.int32)
            cbuf = cbuf.at[idx].min(packed, mode="drop")
            return cbuf[:n_px]

        cbufs = jax.vmap(one_color)(idxs, zs, oks, colors)
        local_c = jnp.min(cbufs, axis=0)
        global_c = jax.lax.pmin(local_c, axis)

        covered = global_c < R._INVALID_PACKED
        img = R.unpack_rgb(jnp.where(covered, global_c, 0))
        img = jnp.where(covered[:, None], img, 0)
        return img.reshape(fused_intrinsics.height, fused_intrinsics.width, 3)

    fn = shard_map(
        per_camera,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),  # replicated fused image
    )
    return jax.jit(fn)


def batched_pair_fuse(fuse_fn, batch_axis_size: int):
    """Data-parallel batched fusion: vmap a frame-pair fuse over a batch.

    For throughput benchmarking of many rigs/streams per step (BASELINE
    stretch config 5). Compose with `jax.jit` (and optionally a mesh
    sharding on the batch axis).
    """
    return jax.jit(jax.vmap(fuse_fn))
