"""Decompose the 3.5 ms image-only dual fuse: prep | 3-key sort |
first-of-run mask + spans | single-pass resolve. Cumulative variants,
same session, chained (25/dispatch)."""
import dataclasses
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft
from pointcloud_depthfusion_tpu.core.camera import fused_virtual_intrinsics
from pointcloud_depthfusion_tpu.core import geometry as G
from pointcloud_depthfusion_tpu.fusion.pipeline import (
    fuse, fused_camera_transform)
from pointcloud_depthfusion_tpu.ops import filters as F
from pointcloud_depthfusion_tpu.ops import render as R
from pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas import (
    invalid_pixel_id, _exact_chunk_spans, _INVALID_PIX)
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

step, (left, right, t_rl, config) = graft._build_fusion(848, 480)
fi = fused_virtual_intrinsics(left.color_intrinsics, config.vertical_image)
INNER = 25
n_px = fi.width * fi.height
maxi = jnp.int32(0x7FFFFFFF)
N_TILES = -(-n_px // 256)


def entries(left, right, t):
    def prep(fs, total):
        d, v = F.filter_depth(fs.depth, fs.depth_scale, config.min_depth,
                              config.max_depth, None)
        x, y, z, v = G.deproject_planar(
            d.astype(jnp.float32) * fs.depth_scale, fs.color_intrinsics, v)
        x, y, z = G.transform_planar(x, y, z, total)
        idx, zc, ok = R.compute_pixel_indices_planar(
            x, y, z, v, fi, config.mirror_image)
        okf = ok.reshape(-1)
        pix = jnp.where(okf, idx.reshape(-1),
                        invalid_pixel_id(n_px)).astype(jnp.int32)
        zb = jnp.where(okf, jax.lax.bitcast_convert_type(
            zc.astype(jnp.float32), jnp.int32).reshape(-1), maxi)
        c = fs.color.astype(jnp.int32)
        rgb = jnp.where(okf, ((c[..., 0] << 16) | (c[..., 1] << 8)
                              | c[..., 2]).reshape(-1), maxi)
        return pix, zb, rgb
    ft = fused_camera_transform(config, t)
    rt = G.mm(ft, t.astype(ft.dtype))
    pl_, zl, rl = prep(left, ft)
    pr_, zr, rr = prep(right, rt)
    return (jnp.concatenate([pl_, pr_]), jnp.concatenate([zl, zr]),
            jnp.concatenate([rl, rr]))


def variant(name, fn):
    @jax.jit
    def chain(carry, left, right, t):
        def body(i, c):
            out = fn(left, right, t + 0.0 * c)
            return out.astype(jnp.float32).sum() * 1e-38 + 0.0 * c
        return jax.lax.fori_loop(0, INNER, body, carry)
    t0 = time.perf_counter()
    float(chain(jnp.float32(0), left, right, t_rl))
    print(f"  [{name}] compile {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    c = jnp.float32(0)
    for _ in range(2):
        c = chain(c, left, right, t_rl)
    float(c)
    per = []
    for _ in range(4):
        t0 = time.perf_counter()
        c = chain(c, left, right, t_rl)
        float(c)
        per.append((time.perf_counter() - t0) * 1e3 / INNER)
    print(f"{name}: p50 {np.percentile(per,50):.2f} ms (min {min(per):.2f})",
          flush=True)


def prep_only(l, r, t):
    p, z, rr = entries(l, r, t)
    n = p.shape[0] // 2
    return (p[:n] + z[:n] + rr[:n]).astype(jnp.float32)


def prep_sort3(l, r, t):
    p, z, rr = entries(l, r, t)
    sp, sz, sr = jax.lax.sort((p, z, rr), num_keys=3, is_stable=False)
    n = p.shape[0] // 2
    return (sp[:n] + sz[:n] + sr[:n]).astype(jnp.float32)


def prep_sort3_mask_spans(l, r, t):
    p, z, rr = entries(l, r, t)
    sp, sz, sr = jax.lax.sort((p, z, rr), num_keys=3, is_stable=False)
    first = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
    spm = jnp.where(first, sp, jnp.int32(_INVALID_PIX))
    cs, ce = _exact_chunk_spans(sp, N_TILES, 256, 1024)
    n = p.shape[0] // 2
    return (spm[:n] + sr[:n]).astype(jnp.float32) + (
        cs + ce).astype(jnp.float32).sum()


cfg_img = dataclasses.replace(config, render_mode="tiled", emit_zbuf=False)


def full_imgonly(l, r, t):
    return fuse(l, r, t, cfg_img, fi).image


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    variant("prep only", prep_only)
    variant("prep+3key sort", prep_sort3)
    variant("prep+sort+mask+spans", prep_sort3_mask_spans)
    variant("full image-only fuse", full_imgonly)
