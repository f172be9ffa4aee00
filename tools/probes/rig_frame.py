import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import dataclasses
import tpu_check
from pointcloud_depthfusion_tpu.fusion.pipeline import FusionConfig
from pointcloud_depthfusion_tpu.parallel.mesh import rig_fuse
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

INNER = 25
n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
w = int(sys.argv[2]) if len(sys.argv) > 2 else 848
h = int(sys.argv[3]) if len(sys.argv) > 3 else 480
intr, rig_args = tpu_check._build_rig(n, w, h)
cfg = FusionConfig.create(vertical_image=False, mirror_image=False,
                          filter_fused_color=False, render_mode="tiled")
fn = rig_fuse(intr, intr, cfg)

@jax.jit
def chain(carry, d, c, s, p):
    def body(i, cc):
        out = fn(d, c, s + 0.0 * cc, p)
        return out.astype(jnp.float32).sum() * 0.0
    return jax.lax.fori_loop(0, INNER, body, carry)

t0 = time.perf_counter()
float(chain(jnp.float32(0), *rig_args))
print(f"rig {n}@{w}x{h} compile {time.perf_counter()-t0:.0f}s", flush=True)
c = jnp.float32(0)
for _ in range(2):
    c = chain(c, *rig_args)
float(c)
per = []
for _ in range(4):
    t0 = time.perf_counter()
    c = chain(c, *rig_args)
    float(c)
    per.append((time.perf_counter() - t0) * 1e3 / INNER)
print(f"rig {n} cams {w}x{h}: p50 {np.percentile(per,50):.2f} ms (min {min(per):.2f})", flush=True)
