import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import dataclasses, functools
import __graft_entry__ as graft
from pointcloud_depthfusion_tpu.core.camera import fused_virtual_intrinsics
from pointcloud_depthfusion_tpu.fusion.pipeline import fuse
from pointcloud_depthfusion_tpu.ops import render as R
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

W, H = 1280, 720
step, (left, right, t_rl, config) = graft._build_fusion(W, H)
fi = fused_virtual_intrinsics(left.color_intrinsics, config.vertical_image)
INNER = 25

def bench(label, tile_px, chunk):
    orig = R.project_zbuffer_tiled_planar
    def patched(*a, **kw):
        kw["tile_px"] = tile_px
        kw["chunk"] = chunk
        return orig(*a, **kw)
    R.project_zbuffer_tiled_planar = patched
    try:
        @jax.jit
        def chain(carry, left, right, t):
            def body(i, c):
                res = fuse(left, right, t + 0.0 * c, config, fi)
                return res.image.astype(jnp.float32).sum() * 0.0
            return jax.lax.fori_loop(0, INNER, body, carry)
        t0 = time.perf_counter()
        float(chain(jnp.float32(0), left, right, t_rl))
        print(f"{label} compile {time.perf_counter()-t0:.0f}s", flush=True)
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
        print(f"{label}: p50 {np.percentile(per,50):.2f} ms (min {min(per):.2f})",
              flush=True)
    finally:
        R.project_zbuffer_tiled_planar = orig

# fusion/pipeline imports R at module level as `R.` calls? It calls
# R.project_zbuffer_tiled_planar at trace time -> monkeypatch works.
for tile_px, chunk in ((256, 1024), (256, 2048), (256, 512), (512, 1024)):
    bench(f"720p tiled ({tile_px},{chunk})", tile_px, chunk)
