"""Pallas fused-prep kernel vs the jnp pipeline path (bit parity)."""

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.core import geometry as G
from pointcloud_depthfusion_tpu.ops import filters as F
from pointcloud_depthfusion_tpu.ops import render as R
from pointcloud_depthfusion_tpu.ops.pallas.fuse_prep_pallas import fuse_prep_pallas
from pointcloud_depthfusion_tpu.io.synthetic import SyntheticScene, two_camera_rig


def jnp_reference(depth, color, scale, min_d, max_d, intr, transform,
                  fused_intr, mirror, z_near, z_far):
    d, valid = F.filter_depth(depth, scale, min_d, max_d, None)
    x, y, z, valid = G.deproject_planar(d.astype(jnp.float32) * scale, intr, valid)
    x, y, z = G.transform_planar(x, y, z, transform)
    idx, zc, ok = R.compute_pixel_indices_planar(x, y, z, valid, fused_intr, mirror)
    z_levels = jnp.float32((1 << 14) - 1)
    zq = jnp.clip((zc - z_near) / (z_far - z_near) * z_levels, 0, z_levels).astype(jnp.uint32)
    c = color.astype(jnp.uint32)
    rgb = ((c[..., 0] >> 2) << 12) | ((c[..., 1] >> 2) << 6) | (c[..., 2] >> 2)
    key = jnp.where(ok, (zq << 18) | rgb, jnp.uint32(0xFFFFFFFF))
    return np.asarray(idx), np.asarray(key)


def test_prep_kernel_matches_jnp():
    intr = Intrinsics.create(128, 64, fx=95.0, fy=96.0, ppx=64.0, ppy=32.0)
    fused = Intrinsics.create(128, 64, fx=95.0, fy=96.0, ppx=64.0, ppy=32.0)
    scene = SyntheticScene()
    wl, wr = two_camera_rig(baseline=0.4, toe_in_deg=6.0)
    fs = scene.render(intr, wr, depth_noise_std=0.002)
    t = np.eye(4, dtype=np.float32)
    a = 0.12
    t[:3, :3] = [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    t[:3, 3] = [0.2, -0.05, 0.1]

    args = dict(
        depth_scale=jnp.asarray(0.001, jnp.float32),
        min_depth=jnp.asarray(0.5, jnp.float32),
        max_depth=jnp.asarray(3.0, jnp.float32),
        z_near=jnp.asarray(0.25, jnp.float32),
        z_far=jnp.asarray(4.0, jnp.float32),
    )
    for mirror in (False, True):
        idx_p, key_p = fuse_prep_pallas(
            jnp.asarray(fs.depth), jnp.asarray(fs.color), args["depth_scale"],
            args["min_depth"], args["max_depth"], intr,
            jnp.asarray(t), fused, mirror, args["z_near"], args["z_far"],
            tile_rows=32, interpret=True,
        )
        idx_j, key_j = jnp_reference(
            jnp.asarray(fs.depth), jnp.asarray(fs.color), args["depth_scale"],
            args["min_depth"], args["max_depth"], intr,
            jnp.asarray(t), fused, mirror, args["z_near"], args["z_far"],
        )
        np.testing.assert_array_equal(np.asarray(idx_p), idx_j)
        kp = np.asarray(key_p)
        # Compiler FMA contraction may flip quantization at exact bucket
        # boundaries for a handful of pixels; everything else is bit-equal
        # and any difference is confined to ±1 zq step (same color bits).
        diff = kp != key_j
        assert diff.mean() < 1e-3, diff.mean()
        if diff.any():
            a, b = kp[diff].astype(np.int64), key_j[diff].astype(np.int64)
            assert ((a & 0x3FFFF) == (b & 0x3FFFF)).all()  # color bits equal
            assert (np.abs((a >> 18) - (b >> 18)) <= 1).all()


def test_pallas_render_mode_matches_packed():
    """fuse(render_mode='pallas') ≈ fuse(render_mode='packed') (identical up
    to FMA-boundary zq flips on a handful of pixels)."""
    import dataclasses
    from pointcloud_depthfusion_tpu.core.frameset import Frameset
    from pointcloud_depthfusion_tpu.core.camera import fused_virtual_intrinsics
    from pointcloud_depthfusion_tpu.fusion.pipeline import FusionConfig, fuse
    from pointcloud_depthfusion_tpu.io.synthetic import right_to_left_transform

    intr = Intrinsics.create(128, 64, fx=95.0, fy=96.0, ppx=64.0, ppy=32.0)
    scene = SyntheticScene()
    wl, wr = two_camera_rig(baseline=0.4, toe_in_deg=6.0)
    fl, fr = scene.render(intr, wl), scene.render(intr, wr)
    t_rl = jnp.asarray(right_to_left_transform(wl, wr), jnp.float32)
    left = Frameset.create(fl.depth, fl.color, intr)
    right = Frameset.create(fr.depth, fr.color, intr)

    base = FusionConfig.create(vertical_image=False, mirror_image=True,
                               filter_fused_color=False, render_mode="packed")
    fi = fused_virtual_intrinsics(intr, False)
    a = np.asarray(fuse(left, right, t_rl, base, fi).image)
    cfg_p = dataclasses.replace(base, render_mode="pallas")
    b = np.asarray(fuse(left, right, t_rl, cfg_p, fi).image)
    mismatch = (a != b).any(-1).mean()
    assert mismatch < 2e-3, mismatch


def test_prep_kernel_whole_plane_fallback_height():
    """Heights with no multiple-of-8 divisor fall back to one whole-plane
    tile (largest_tile_rows(h) == h) — the validation must accept it."""
    from pointcloud_depthfusion_tpu.ops.pallas.fuse_prep_pallas import (
        largest_tile_rows,
    )

    assert largest_tile_rows(36) == 36
    intr = Intrinsics.create(64, 36, fx=50.0, fy=50.0, ppx=32.0, ppy=18.0)
    scene = SyntheticScene()
    _, wr = two_camera_rig(baseline=0.4, toe_in_deg=6.0)
    fs = scene.render(intr, wr)
    f32 = jnp.float32
    idx, key = fuse_prep_pallas(
        jnp.asarray(fs.depth), jnp.asarray(fs.color), jnp.asarray(0.001, f32),
        jnp.asarray(0.5, f32), jnp.asarray(3.0, f32), intr,
        jnp.eye(4, dtype=f32), intr, False,
        jnp.asarray(0.25, f32), jnp.asarray(4.0, f32), interpret=True,
    )
    assert idx.shape == (36, 64) and key.shape == (36, 64)
    import pytest

    with pytest.raises(ValueError, match="divide"):
        fuse_prep_pallas(
            jnp.asarray(fs.depth), jnp.asarray(fs.color),
            jnp.asarray(0.001, f32), jnp.asarray(0.5, f32),
            jnp.asarray(3.0, f32), intr, jnp.eye(4, dtype=f32), intr, False,
            jnp.asarray(0.25, f32), jnp.asarray(4.0, f32),
            tile_rows=16, interpret=True,
        )
