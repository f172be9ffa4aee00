import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

INNER = 25
rng = np.random.default_rng(0)

def probe(n, n_ops=3, n_sorts=1, label=""):
    ops = tuple(jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int64), jnp.int32)
                for _ in range(n_ops))

    @jax.jit
    def chain(carry, ops):
        def body(i, c):
            pert = jax.lax.bitcast_convert_type(0.0 * c, jnp.int32)
            acc = jnp.float32(0)
            for s in range(n_sorts):
                outs = jax.lax.sort(
                    tuple(o + pert + s if j == 0 else o
                          for j, o in enumerate(ops)),
                    num_keys=1, is_stable=False)
                # order-dependent consume: sort can't fold to a reduction
                acc = acc + outs[-1][: n // 2].sum().astype(jnp.float32)
            return acc * jnp.float32(1e-38) + 0.0 * c
        return jax.lax.fori_loop(0, INNER, body, carry)

    t0 = time.perf_counter()
    float(chain(jnp.float32(0), ops))
    print(f"{label or n} compile {time.perf_counter()-t0:.0f}s", flush=True)
    c = jnp.float32(0)
    for _ in range(2):
        c = chain(c, ops)
    float(c)  # true fence: D2H of the carry
    per = []
    for _ in range(4):
        t0 = time.perf_counter()
        c = chain(c, ops)
        float(c)
        per.append((time.perf_counter() - t0) * 1e3 / INNER)
    print(f"{label or n} x{n_sorts}: p50 {np.percentile(per,50):.2f} ms", flush=True)

for n in (407_000, 814_000, 1_630_000, 3_260_000):
    probe(n)
probe(407_000, n_sorts=8, label="8x407k")
probe(814_000, n_sorts=4, label="4x814k")
