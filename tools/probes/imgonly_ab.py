"""A/B on-chip: tiled fuse WITH z-buffer output vs image-only resolve
(emit_zbuf=False → zresolve_winner_rgb: 3-key sort + first-of-run mask +
single-pass kernel), dual 848×480; plus a geometry check of the new
kernel."""
import dataclasses
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft
from pointcloud_depthfusion_tpu.core.camera import fused_virtual_intrinsics
from pointcloud_depthfusion_tpu.fusion.pipeline import fuse
import pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas as zp
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
import functools
enable_persistent_cache()

W = int(sys.argv[1]) if len(sys.argv) > 1 else 848
H = int(sys.argv[2]) if len(sys.argv) > 2 else 480
step, (left, right, t_rl, config) = graft._build_fusion(W, H)
fi = fused_virtual_intrinsics(left.color_intrinsics, config.vertical_image)
INNER = 25
ORIG = zp.zresolve_winner_rgb


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


def make_fuse(emit_zbuf, tile_px=None, chunk=None):
    cfg = dataclasses.replace(config, render_mode="tiled",
                              emit_zbuf=emit_zbuf)

    def run(left, right, t):
        kw = {}
        if tile_px:
            kw["tile_px"] = tile_px
        if chunk:
            kw["chunk"] = chunk
        if kw:
            zp.zresolve_winner_rgb = functools.partial(ORIG, **kw)
        try:
            return fuse(left, right, t, cfg, fi).image
        finally:
            zp.zresolve_winner_rgb = ORIG
    return run


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    variant("tiled WITH zbuf", make_fuse(True))
    variant("tiled image-only", make_fuse(False))
    if "--sweep" in sys.argv:
        variant("image-only (512,1024)", make_fuse(False, tile_px=512))
        variant("image-only (256,2048)", make_fuse(False, chunk=2048))
        variant("image-only (512,2048)",
                make_fuse(False, tile_px=512, chunk=2048))
        variant("image-only (128,1024)", make_fuse(False, tile_px=128))
