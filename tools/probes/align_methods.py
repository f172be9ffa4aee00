import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import tpu_check
from pointcloud_depthfusion_tpu.ops.align import align_depth_to_color, auto_footprint
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

d_intr, c_intr, ext, depth = tpu_check._build_align_inputs(848, 480)
depth_j = jnp.asarray(depth)
print("auto bound:", auto_footprint(d_intr, c_intr, ext), flush=True)
INNER = 25

def bench(method, fp):
    @jax.jit
    def chain(carry):
        def body(i, c):
            # non-foldable perturbation: 0.0*f32 carry, bitcast to int
            pert = jax.lax.bitcast_convert_type(0.0 * c, jnp.uint32).astype(jnp.uint16)
            out = align_depth_to_color(
                depth_j + pert, 0.001, d_intr, c_intr, ext,
                max_footprint=fp, method=method)
            return out.astype(jnp.float32).sum() * 0.0
        return jax.lax.fori_loop(0, INNER, body, carry)
    t0 = time.perf_counter()
    jax.block_until_ready(chain(jnp.float32(0.0)))
    print(f"{method} k={fp} compile {time.perf_counter()-t0:.1f}s", flush=True)
    c = jnp.float32(0.0)
    for _ in range(2):
        c = chain(c)
    jax.block_until_ready(c)
    per = []
    for _ in range(4):
        t0 = time.perf_counter()
        c = chain(c)
        jax.block_until_ready(c)
        per.append((time.perf_counter() - t0) * 1e3 / INNER)
    print(f"{method} k={fp}: p50 {np.percentile(per,50):.2f} ms (min {min(per):.2f})", flush=True)

for fp in (3, 4):
    bench("binned", fp)
    bench("sorted", fp)
