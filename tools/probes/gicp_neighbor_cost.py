"""On-chip per-iteration cost of the multi-voxel correspondence search:
direct1 vs direct7 vs direct27 at 32k source points (slope between pinned
8- and 32-iteration solves cancels the relay dispatch+transfer base)."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pointcloud_depthfusion_tpu.registration.gicp import (
    GICPConfig, gicp_register_prepared, prepare_target,
)
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

rng = np.random.default_rng(0)
m = 32768
src = rng.normal(0, 0.18, size=(m, 3)).astype(np.float32)
tgt = src + rng.normal(0, 0.002, src.shape).astype(np.float32)
ones = jnp.ones(m, bool)
src_d = jnp.asarray(src)
eye = jnp.eye(4, dtype=jnp.float32)


def run(ns, iters, reps=5):
    cfg = GICPConfig.create(
        resolution=0.05, voxel_size=0.01, kernel_width=0.0,
        kernel_max_dist=-1.0, max_iterations=64, iteration_cap=iters,
        table_size=1 << 15, neighbor_search=ns,
        rotation_eps=0.0, translation_eps=0.0, fitness_eps=0.0,
    )
    grid = jax.jit(prepare_target)(jnp.asarray(tgt), ones, cfg)
    jax.block_until_ready(grid.mean)
    solve = jax.jit(gicp_register_prepared)
    t0 = time.perf_counter()
    res = solve(src_d, ones, grid, eye, cfg)
    it = int(res.iterations)
    print(f"  [{ns} iters={iters}] compile {time.perf_counter()-t0:.0f}s "
          f"(ran {it})", file=sys.stderr, flush=True)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(solve(src_d, ones, grid, eye, cfg).fitness)
        per.append((time.perf_counter() - t0) * 1e3)
    return float(np.percentile(per, 50))


for ns in ("direct1", "direct7", "direct27"):
    a = run(ns, 8)
    b = run(ns, 32)
    print(f"{ns}: 8it {a:.1f} ms, 32it {b:.1f} ms -> "
          f"{(b - a) / 24:.3f} ms/iter", flush=True)
