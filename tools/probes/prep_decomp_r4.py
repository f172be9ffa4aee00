"""Round-4b: decompose the dual-fuse PREP stage (1.26 ms in the r3 draw).

Cumulative variants, same session, chained (25/dispatch):
  filter      — minmax window only
  +deproject  — planar pinhole deprojection
  +transform  — rigid transform into the virtual frame
  +indices    — project + C-cast rounding + bounds test
  +pack       — where/bitcast/RGB pack to the 3 sort operands
  +concat     — the two-camera concatenate (full prep)
Each consumes order-dependently through the f32 carry (CLAUDE.md probe
methodology). Differences between adjacent rows = marginal stage cost.
"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft
from pointcloud_depthfusion_tpu.core.camera import fused_virtual_intrinsics
from pointcloud_depthfusion_tpu.core import geometry as G
from pointcloud_depthfusion_tpu.fusion.pipeline import fused_camera_transform
from pointcloud_depthfusion_tpu.ops import filters as F
from pointcloud_depthfusion_tpu.ops import render as R
from pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas import invalid_pixel_id
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

step, (left, right, t_rl, config) = graft._build_fusion(848, 480)
fi = fused_virtual_intrinsics(left.color_intrinsics, config.vertical_image)
INNER = 25
n_px = fi.width * fi.height
maxi = jnp.int32(0x7FFFFFFF)


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


def both(fn, left, right, t):
    ft = fused_camera_transform(config, t)
    rt = G.mm(ft, t.astype(ft.dtype))
    a = fn(left, ft)
    b = fn(right, rt)
    return sum(x[: x.shape[0] // 2].reshape(-1).astype(jnp.float32).sum()
               for x in a + b if hasattr(x, "shape")).reshape(())


def stage_filter(fs, total):
    d, v = F.filter_depth(fs.depth, fs.depth_scale, config.min_depth,
                          config.max_depth, None)
    return (d.reshape(-1), v.reshape(-1))


def stage_deproject(fs, total):
    d, v = F.filter_depth(fs.depth, fs.depth_scale, config.min_depth,
                          config.max_depth, None)
    x, y, z, v = G.deproject_planar(
        d.astype(jnp.float32) * fs.depth_scale, fs.color_intrinsics, v)
    return (x.reshape(-1), y.reshape(-1), z.reshape(-1), v.reshape(-1))


def stage_transform(fs, total):
    d, v = F.filter_depth(fs.depth, fs.depth_scale, config.min_depth,
                          config.max_depth, None)
    x, y, z, v = G.deproject_planar(
        d.astype(jnp.float32) * fs.depth_scale, fs.color_intrinsics, v)
    x, y, z = G.transform_planar(x, y, z, total)
    return (x.reshape(-1), y.reshape(-1), z.reshape(-1), v.reshape(-1))


def stage_indices(fs, total):
    d, v = F.filter_depth(fs.depth, fs.depth_scale, config.min_depth,
                          config.max_depth, None)
    x, y, z, v = G.deproject_planar(
        d.astype(jnp.float32) * fs.depth_scale, fs.color_intrinsics, v)
    x, y, z = G.transform_planar(x, y, z, total)
    idx, zc, ok = R.compute_pixel_indices_planar(
        x, y, z, v, fi, config.mirror_image)
    return (idx.reshape(-1), zc.reshape(-1), ok.reshape(-1))


def stage_pack(fs, total):
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
    return (pix, zb, rgb)


def full_concat(left, right, t):
    ft = fused_camera_transform(config, t)
    rt = G.mm(ft, t.astype(ft.dtype))
    a = stage_pack(left, ft)
    b = stage_pack(right, rt)
    cat = [jnp.concatenate([x, y]) for x, y in zip(a, b)]
    n = cat[0].shape[0] // 2
    return sum(x[:n].astype(jnp.float32).sum() for x in cat).reshape(())


def stage_pack_pre(fs, total, packed):
    """Like stage_pack but RGB arrives pre-packed as one (H, W) i32 plane
    (host-side pack candidate — kills the HWC u8 minor-dim relayout)."""
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
    rgb = jnp.where(okf, packed.reshape(-1), maxi)
    return (pix, zb, rgb)


def make_packed(fs):
    c = np.asarray(fs.color).astype(np.int32)
    return jnp.asarray((c[..., 0] << 16) | (c[..., 1] << 8) | c[..., 2])


packed_l = make_packed(left)
packed_r = make_packed(right)


def variant_prepacked(name):
    """Same harness as variant() but with the packed planes as jit ARGS
    (closure constants defeat the persistent cache and bloat the HLO)."""
    @jax.jit
    def chain(carry, left, right, t, pl_, pr_):
        def body(i, c):
            ft = fused_camera_transform(config, t + 0.0 * c)
            rt = G.mm(ft, (t + 0.0 * c).astype(ft.dtype))
            a = stage_pack_pre(left, ft, pl_)
            b = stage_pack_pre(right, rt, pr_)
            cat = [jnp.concatenate([x, y]) for x, y in zip(a, b)]
            n = cat[0].shape[0] // 2
            out = sum(x[:n].astype(jnp.float32).sum() for x in cat)
            return out * 1e-38 + 0.0 * c
        return jax.lax.fori_loop(0, INNER, body, carry)
    t0 = time.perf_counter()
    float(chain(jnp.float32(0), left, right, t_rl, packed_l, packed_r))
    print(f"  [{name}] compile {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    c = jnp.float32(0)
    for _ in range(2):
        c = chain(c, left, right, t_rl, packed_l, packed_r)
    float(c)
    per = []
    for _ in range(4):
        t0 = time.perf_counter()
        c = chain(c, left, right, t_rl, packed_l, packed_r)
        float(c)
        per.append((time.perf_counter() - t0) * 1e3 / INNER)
    print(f"{name}: p50 {np.percentile(per,50):.2f} ms (min {min(per):.2f})",
          flush=True)


variant("filter   ", lambda l, r, t: both(stage_filter, l, r, t))
variant("+deproj  ", lambda l, r, t: both(stage_deproject, l, r, t))
variant("+xform   ", lambda l, r, t: both(stage_transform, l, r, t))
variant("+indices ", lambda l, r, t: both(stage_indices, l, r, t))
variant("+pack    ", lambda l, r, t: both(stage_pack, l, r, t))
variant("+concat  ", full_concat)
variant_prepacked("prepacked")
