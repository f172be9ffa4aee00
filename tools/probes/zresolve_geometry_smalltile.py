import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft
from pointcloud_depthfusion_tpu.core.camera import fused_virtual_intrinsics
from pointcloud_depthfusion_tpu.fusion.pipeline import fuse
from pointcloud_depthfusion_tpu.ops import render as R
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

step, (left, right, t_rl, config) = graft._build_fusion(848, 480)
fi = fused_virtual_intrinsics(left.color_intrinsics, config.vertical_image)
INNER = 25
orig = R.project_zbuffer_tiled_planar

def bench(tile_px, chunk):
    def patched(*a, **kw):
        kw["tile_px"] = tile_px
        kw["chunk"] = chunk
        return orig(*a, **kw)
    R.project_zbuffer_tiled_planar = patched
    try:
        @jax.jit
        def chain(carry, l, r, t):
            def body(i, c):
                res = fuse(l, r, t + 0.0 * c, config, fi)
                return res.image.astype(jnp.float32).sum() * 0.0
            return jax.lax.fori_loop(0, INNER, body, carry)
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
        print(f"({tile_px},{chunk}): p50 {np.percentile(per,50):.2f} ms "
              f"(min {min(per):.2f})", flush=True)
    except Exception as e:
        print(f"({tile_px},{chunk}): FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
    finally:
        R.project_zbuffer_tiled_planar = orig

for g in ((64, 256), (128, 256), (64, 512), (128, 512), (32, 256), (8, 256)):
    bench(*g)
