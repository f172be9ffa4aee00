"""Does the GICP warm iteration cost (~1.4 ms/iter at 32k voxels) scale
with the workload, or is it the relay's small-body per-step floor?

Method: run the planar GN solve with a FIXED iteration count (epsilons at
0 so convergence never fires, iteration_cap pins the trip count) on
M = 32k and M = 262k source points (8x), one dispatch per solve, D2H
fence. If per-iteration time is ~flat across 8x the per-point work, the
cost is the while_loop step floor (scalar-carry dispatch overhead on this
relay), not device compute — meaning a single-kernel GN body would win
nothing HERE and must be evaluated on a device-attached host.

Also A/Bs iteration counts (8 vs 32) at fixed M to split setup cost
(prep/grid build) from the per-iteration slope.
"""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pointcloud_depthfusion_tpu.registration.gicp import (
    GICPConfig, gicp_register_prepared, prepare_target,
)
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

rng = np.random.default_rng(0)


def cloud(m):
    # bunny-ish blob, ~0.5 m extent
    pts = rng.normal(0, 0.18, size=(m, 3)).astype(np.float32)
    return pts


def run(m, iters, reps=4):
    src = cloud(m)
    tgt = src + rng.normal(0, 0.002, src.shape).astype(np.float32)
    cfg = GICPConfig.create(
        resolution=0.05, voxel_size=0.01, kernel_width=0.0,
        kernel_max_dist=-1.0, max_iterations=64, iteration_cap=iters,
        table_size=1 << 15,
        rotation_eps=0.0, translation_eps=0.0, fitness_eps=0.0,
    )
    ones = jnp.ones(m, bool)
    grid = jax.jit(prepare_target)(jnp.asarray(tgt), ones, cfg)
    jax.block_until_ready(grid.mean)
    # eager multi-op pipelines over the relay are unsupported (round-3
    # corruption note) — everything jitted.
    solve = jax.jit(gicp_register_prepared)
    src_d = jnp.asarray(src)
    eye = jnp.eye(4, dtype=jnp.float32)

    def once():
        res = solve(src_d, ones, grid, eye, cfg)
        return float(res.fitness), int(res.iterations)

    t0 = time.perf_counter()
    fit, it = once()
    print(f"  [M={m} iters={iters}] compile {time.perf_counter()-t0:.0f}s "
          f"(ran {it} iters)", file=sys.stderr, flush=True)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        once()
        per.append((time.perf_counter() - t0) * 1e3)
    p50 = float(np.percentile(per, 50))
    print(f"M={m:>7} iters={iters:>3}: solve p50 {p50:.2f} ms", flush=True)
    return p50


a8 = run(32768, 8)
a32 = run(32768, 32)
b8 = run(262144, 8)
b32 = run(262144, 32)
print(f"per-iter slope 32k: {(a32-a8)/24:.3f} ms/iter; "
      f"262k: {(b32-b8)/24:.3f} ms/iter", flush=True)
