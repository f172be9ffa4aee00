"""A/B: round-3 zresolve feed (searchsorted + (4,N) stack, 4-op kernel)
vs round-4 feed (two-level exact spans + 3-operand stack-free kernel),
on the full dual-848×480 tiled fuse; plus a geometry re-check of the new
kernel (CLAUDE.md: re-tune after any kernel change)."""
import functools
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft
from pointcloud_depthfusion_tpu.core.camera import fused_virtual_intrinsics
from pointcloud_depthfusion_tpu.fusion.pipeline import fuse
from pointcloud_depthfusion_tpu.ops import render as R
import pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas as zp
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

step, (left, right, t_rl, config) = graft._build_fusion(848, 480)
fi = fused_virtual_intrinsics(left.color_intrinsics, config.vertical_image)
INNER = 25
ORIG = zp.zresolve_sorted_entries


def variant(name, fn, reps=4):
    @jax.jit
    def chain(carry, left, right, t):
        def body(i, c):
            out = fn(left, right, t + 0.0 * c)
            return out.astype(jnp.float32).sum() * 1e-38 + 0.0 * c
        return jax.lax.fori_loop(0, INNER, body, carry)
    t0 = time.perf_counter()
    float(chain(jnp.float32(0), left, right, t_rl))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    c = jnp.float32(0)
    for _ in range(2):
        c = chain(c, left, right, t_rl)
    float(c)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = chain(c, left, right, t_rl)
        float(c)
        per.append((time.perf_counter() - t0) * 1e3 / INNER)
    print(f"{name}: p50 {np.percentile(per,50):.2f} ms "
          f"(min {min(per):.2f})", flush=True)


def make_fuse(legacy=None, tile_px=None, chunk=None):
    def run(left, right, t):
        kw = {}
        if legacy:
            kw["legacy_feed"] = True
        if tile_px:
            kw["tile_px"] = tile_px
        if chunk:
            kw["chunk"] = chunk
        zp.zresolve_sorted_entries = functools.partial(ORIG, **kw)
        try:
            return fuse(left, right, t, config, fi).image
        finally:
            zp.zresolve_sorted_entries = ORIG
    return run


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    variant("full fuse NEW feed (256,1024)", make_fuse())
    variant("full fuse LEGACY feed (256,1024)", make_fuse(legacy=True))
    # geometry re-check for the 3-operand kernel
    variant("new feed (256,512)", make_fuse(chunk=512))
    variant("new feed (512,1024)", make_fuse(tile_px=512))
    variant("new feed (128,1024)", make_fuse(tile_px=128))
    variant("new feed (128,512)", make_fuse(tile_px=128, chunk=512))
    variant("new feed (256,2048)", make_fuse(chunk=2048))
