"""Dual-fuse component decomposition: prep-only vs prep+sort vs full."""
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
    invalid_pixel_id)
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

step, (left, right, t_rl, config) = graft._build_fusion(848, 480)
fi = fused_virtual_intrinsics(left.color_intrinsics, config.vertical_image)
INNER = 25
n_px = fi.width * fi.height
maxi = jnp.int32(0x7FFFFFFF)

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
        pix = jnp.where(okf, idx.reshape(-1), invalid_pixel_id(n_px)).astype(jnp.int32)
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
    print(f"{name}: p50 {np.percentile(per,50):.2f} ms", flush=True)

def prep_only(left, right, t):
    p, z, r = entries(left, right, t)
    return (p + z + r).astype(jnp.float32)

def prep_sort(left, right, t):
    p, z, r = entries(left, right, t)
    sp, sz, sr = jax.lax.sort((p, z, r), num_keys=1, is_stable=False)
    return (sp[: p.shape[0] // 2] + sr[: p.shape[0] // 2]).astype(jnp.float32)

def full(left, right, t):
    return fuse(left, right, t, config, fi).image

variant("prep only", prep_only)
variant("prep+sort", prep_sort)
variant("full fuse", full)

from pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas import (
    zresolve_sorted_entries)
import dataclasses

def prep_sort_resolve(left, right, t):
    p, z, r = entries(left, right, t)
    minz, mrgb = zresolve_sorted_entries(p, z, r, n_px)
    return (minz + mrgb).astype(jnp.float32)

cfg_nofilter = dataclasses.replace(config, filter_fused_color=False)

def full_nofilter(left, right, t):
    return fuse(left, right, t, cfg_nofilter, fi).image

variant("prep+sort+resolve", prep_sort_resolve)
variant("full minus gauss", full_nofilter)

def prep_sort_feed(left, right, t):
    p, z, r = entries(left, right, t)
    n = p.shape[0]
    chunk = 1024
    n2 = -(-n // chunk) * chunk
    if n2 != n:
        fill = jnp.full((n2 - n,), jnp.int32(0x7FFFFFFF))
        p = jnp.concatenate([p, jnp.full((n2 - n,), jnp.int32(0x40000000))])
        z = jnp.concatenate([z, fill]); r = jnp.concatenate([r, fill])
    sp, sz, sr = jax.lax.sort((p, z, r), num_keys=1, is_stable=False)
    n_tiles = -(-n_px // 256)
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * 256
    starts = jnp.searchsorted(sp, bounds).astype(jnp.int32)
    ent = jnp.stack([sp, sz, sr, sp])
    return (ent[:, ::977].sum() + starts.sum()).astype(jnp.float32)

variant("prep+sort+feed(stack+searchsorted)", prep_sort_feed)
