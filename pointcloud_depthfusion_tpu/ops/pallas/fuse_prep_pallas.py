"""Pallas kernel: the fused per-pixel math of the fusion hot path.

One kernel computes, per input pixel of one camera:

    uint16 depth → minmax window → metric depth → deproject (pinhole) →
    rigid transform into the virtual frame → project → C-cast pixel
    rounding → bounds test → packed (zq14|RGB666) z-buffer key

i.e. everything in the fusion pipeline except the final scatter-min (which
stays an XLA scatter — see CLAUDE.md for why a Mosaic scatter can't win).
Tiled over row blocks with all scalars (intrinsics, transform, window,
quantization) prefetched into SMEM. Outputs are the flat pixel index and
the uint32 key, ready for `buf.at[idx].min(key)`.

Matches the jnp path to within one zq quantization step on a small
fraction of pixels (same op order and truncation semantics, but Mosaic may
contract a*b+c to FMA where XLA keeps separate rounding; measured <=0.1%
of keys off by ±1 step — see tests/test_pallas_prep.py's tolerance).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloud_depthfusion_tpu.core.camera import Intrinsics

Array = jax.Array

# params layout (f32): 0:fx 1:fy 2:ppx 3:ppy (source camera)
# 4..15: row-major 3x4 transform
# 16:fx' 17:fy' 18:ppx' 19:ppy' (target camera)
# 20:lo_raw 21:hi_raw (uint16 window, as f32)
# 22:depth_scale 23:z_near 24:z_range (z_far - z_near)
_N_PARAMS = 32


def _kernel(params_ref, depth_ref, r_ref, g_ref, b_ref, idx_ref, key_ref,
            *, tile_rows: int, out_width: int, out_height: int,
            mirror: bool):
    row0 = pl.program_id(0) * tile_rows

    p = params_ref
    fx, fy, ppx, ppy = p[0], p[1], p[2], p[3]
    t00, t01, t02, t03 = p[4], p[5], p[6], p[7]
    t10, t11, t12, t13 = p[8], p[9], p[10], p[11]
    t20, t21, t22, t23 = p[12], p[13], p[14], p[15]
    ofx, ofy, oppx, oppy = p[16], p[17], p[18], p[19]
    lo, hi = p[20], p[21]
    scale, z_near, z_range = p[22], p[23], p[24]

    d_raw = depth_ref[:].astype(jnp.int32)
    keep = (d_raw.astype(jnp.float32) >= lo) & (d_raw.astype(jnp.float32) <= hi)
    valid = keep & (d_raw > 0)
    z0 = d_raw.astype(jnp.float32) * scale

    # iota must be integer-typed in Mosaic; cast after.
    u = jax.lax.broadcasted_iota(jnp.int32, d_raw.shape, 1).astype(jnp.float32)
    v = (
        jax.lax.broadcasted_iota(jnp.int32, d_raw.shape, 0) + row0
    ).astype(jnp.float32)
    x0 = (u - ppx) / fx * z0
    y0 = (v - ppy) / fy * z0

    x = t00 * x0 + t01 * y0 + t02 * z0 + t03
    y = t10 * x0 + t11 * y0 + t12 * z0 + t13
    z = t20 * x0 + t21 * y0 + t22 * z0 + t23

    pos_z = z > 0.0
    inv_z = 1.0 / jnp.where(pos_z, z, 1.0)
    image_x = oppx + ofx * x * inv_z
    image_y = oppy + ofy * y * inv_z
    px = (image_x + 0.5).astype(jnp.int32)
    py = (image_y + 0.5).astype(jnp.int32)
    ok = (
        valid & pos_z
        & (px >= 0) & (py >= 0)
        & (px <= out_width - 1) & (py <= out_height - 1)
    )
    if mirror:
        px = (out_width - 1) - px
    flat = jnp.where(ok, py * out_width + px, out_width * out_height)

    # Same op order as the jnp path (divide then multiply) so the quantized
    # depth rounds identically at bucket boundaries. f32 -> i32 -> u32:
    # Mosaic has no direct f32->u32 cast.
    z_levels = jnp.float32((1 << 14) - 1)
    # z_levels-1: see ops/render.project_zbuffer_packed_planar (a max-zq
    # near-white point's key would equal the 0xFFFFFFFF sentinel).
    zq = (
        jnp.clip((z - z_near) / z_range * z_levels, 0.0, z_levels - 1.0)
        .astype(jnp.int32)
        .astype(jnp.uint32)
    )
    rgb = (
        ((r_ref[:].astype(jnp.uint32) >> 2) << 12)
        | ((g_ref[:].astype(jnp.uint32) >> 2) << 6)
        | (b_ref[:].astype(jnp.uint32) >> 2)
    )
    key = jnp.where(ok, (zq << 18) | rgb, jnp.uint32(0xFFFFFFFF))

    idx_ref[:] = flat
    key_ref[:] = key


def largest_tile_rows(h: int, cap: int = 64) -> int:
    """Largest multiple-of-8 divisor of h, capped (Mosaic tiling rule)."""
    for cand in range(min(cap, h), 7, -1):
        if cand % 8 == 0 and h % cand == 0:
            return cand
    return h  # fall back to one whole-plane tile


def fuse_prep_pallas(
    depth_u16: Array,
    color: Array,
    depth_scale,
    min_depth,
    max_depth,
    intrinsics: Intrinsics,
    transform: Array,  # (4, 4) camera→virtual
    fused_intrinsics: Intrinsics,
    mirror: bool,
    z_near,
    z_far,
    tile_rows: int | None = None,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Compute (flat index, packed key) for every pixel of one camera.

    Equivalent to filter_depth → deproject_planar → transform_planar →
    compute_pixel_indices_planar → pack, as one Pallas kernel.

    ``tile_rows`` must divide the image height and be a multiple of 8
    (Mosaic tiling rule); the default derives the largest such divisor —
    a fixed 64 would reject the flagship 480-row frames (480 % 64 != 0).
    """
    h, w = depth_u16.shape
    if tile_rows is None:
        tile_rows = largest_tile_rows(h)
    if h % tile_rows != 0:
        # ValueError, not assert: stripped under -O, a non-dividing tile
        # would silently leave the trailing rows of every frame unrendered.
        # Divisibility only — largest_tile_rows legitimately falls back to
        # tile_rows == h (one whole-plane tile) for heights with no
        # multiple-of-8 divisor, and Mosaic handles that single block.
        raise ValueError(
            f"tile_rows={tile_rows} must divide the image height {h}"
        )
    f = jnp.float32
    z_levels = jnp.float32((1 << 14) - 1)

    lo = (jnp.asarray(min_depth, f) / depth_scale).astype(jnp.uint16).astype(f)
    hi = (jnp.asarray(max_depth, f) / depth_scale).astype(jnp.uint16).astype(f)
    t = transform.astype(f)
    params = jnp.zeros((_N_PARAMS,), f)
    params = params.at[0:4].set(
        jnp.stack([
            jnp.asarray(intrinsics.fx, f), jnp.asarray(intrinsics.fy, f),
            jnp.asarray(intrinsics.ppx, f), jnp.asarray(intrinsics.ppy, f),
        ])
    )
    params = params.at[4:16].set(t[:3, :].reshape(-1))
    params = params.at[16:20].set(
        jnp.stack([
            jnp.asarray(fused_intrinsics.fx, f), jnp.asarray(fused_intrinsics.fy, f),
            jnp.asarray(fused_intrinsics.ppx, f), jnp.asarray(fused_intrinsics.ppy, f),
        ])
    )
    z_near = jnp.asarray(z_near, f)
    z_far = jnp.asarray(z_far, f)
    params = params.at[20:25].set(
        jnp.stack([
            lo, hi, jnp.asarray(depth_scale, f), z_near, z_far - z_near,
        ])
    )

    planar = jnp.moveaxis(color, -1, 0)
    kernel = functools.partial(
        _kernel,
        tile_rows=tile_rows,
        out_width=fused_intrinsics.width,
        out_height=fused_intrinsics.height,
        mirror=mirror,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h // tile_rows,),
        in_specs=[
            pl.BlockSpec((tile_rows, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, w), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    idx, key = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h, w), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.uint32),
        ],
        interpret=interpret,
    )(params, depth_u16, planar[0], planar[1], planar[2])
    return idx, key
