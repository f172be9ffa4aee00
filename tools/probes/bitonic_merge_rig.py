"""Measure the LAST untried 8-cam sort-wall shape (VERDICT r3 item 6):
replace the single 3.26M 3-operand lax.sort with 8 per-camera sorts plus
an explicit XLA bitonic merge network (gather-free: reshape + reverse +
lexicographic compare-exchange passes).

Analytic estimate said ~10 ms (63 full-array passes, HBM-bound) vs the
5.25 ms monolithic sort; this probe turns the estimate into data.

Variants (chained, 10 dependent iterations/dispatch):
  sort3.26M   — baseline: one lax.sort (pix,z,rgb) num_keys=3 over 3.26M
  8xsort407k  — 8 per-slab sorts in one program (no merge: lower bound)
  8sort+merge — per-slab sorts padded to 2^19 + 3 bitonic merge rounds
Correctness: merge output == lax.sort of the padded array, elementwise
(the 3-key total order makes the sorted sequence unique).
"""
import sys, time
import numpy as np, jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from pointcloud_depthfusion_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

N_CAM = 8
SLAB = 407040  # 848*480 entries per camera
PAD = 1 << 19  # bitonic needs power-of-two slabs (+29% entries)
N_PX = 407040
INVALID = 0x40000000
MAXI = 0x7FFFFFFF
INNER = 10

rng = np.random.default_rng(0)
# Realistic entry mix: ~95% valid pixels (clustered like a projected
# cloud: sorted-ish blocks per row), 5% invalid sentinel entries.
pix_np = rng.integers(0, N_PX, size=(N_CAM, SLAB), dtype=np.int32)
invalid = rng.random((N_CAM, SLAB)) < 0.05
pix_np[invalid] = INVALID
z_np = rng.integers(0, MAXI, size=(N_CAM, SLAB), dtype=np.int32)
z_np[invalid] = MAXI
rgb_np = rng.integers(0, 1 << 24, size=(N_CAM, SLAB), dtype=np.int32)
rgb_np[invalid] = MAXI
pix_a, z_a, rgb_a = (jnp.asarray(x) for x in (pix_np, z_np, rgb_np))


def lex_swap(p1, z1, r1, p2, z2, r2):
    """True where (p2,z2,r2) < (p1,z1,r1) — lexicographic 3-key order."""
    return (p1 > p2) | ((p1 == p2) & ((z1 > z2) | ((z1 == z2) & (r1 > r2))))


def compare_exchange(lo, hi):
    """Elementwise compare-exchange of two (…,) operand triples."""
    sw = lex_swap(*lo, *hi)
    new_lo = tuple(jnp.where(sw, h, l) for l, h in zip(lo, hi))
    new_hi = tuple(jnp.where(sw, l, h) for l, h in zip(lo, hi))
    return new_lo, new_hi


def bitonic_merge_level(ops, seg):
    """One merge round: adjacent sorted runs of length seg/2 → sorted seg.

    ops: 3 flat (N,) arrays, N divisible by seg; each seg/2 run sorted.
    """
    n = ops[0].shape[0]
    # Form bitonic sequences: reverse the second half of every segment.
    def mk_bitonic(x):
        x = x.reshape(n // seg, 2, seg // 2)
        return jnp.concatenate([x[:, 0], x[:, 1, ::-1]], -1).reshape(-1)

    ops = tuple(mk_bitonic(x) for x in ops)
    d = seg // 2
    while d >= 1:
        blocks = tuple(x.reshape(n // (2 * d), 2, d) for x in ops)
        lo = tuple(b[:, 0] for b in blocks)
        hi = tuple(b[:, 1] for b in blocks)
        lo, hi = compare_exchange(lo, hi)
        ops = tuple(
            jnp.stack([l, h], 1).reshape(-1) for l, h in zip(lo, hi)
        )
        d //= 2
    return ops


def pad_slabs(p, z, r):
    padw = ((0, 0), (0, PAD - SLAB))
    return (
        jnp.pad(p, padw, constant_values=MAXI),
        jnp.pad(z, padw, constant_values=MAXI),
        jnp.pad(r, padw, constant_values=MAXI),
    )


def v_sort_flat(p, z, r):
    sp, sz, sr = jax.lax.sort(
        (p.reshape(-1), z.reshape(-1), r.reshape(-1)),
        num_keys=3, is_stable=False,
    )
    return sp, sz, sr


def v_sort_slabs(p, z, r):
    outs = [
        jax.lax.sort((p[i], z[i], r[i]), num_keys=3, is_stable=False)
        for i in range(N_CAM)
    ]
    return (
        jnp.concatenate([o[0] for o in outs]),
        jnp.concatenate([o[1] for o in outs]),
        jnp.concatenate([o[2] for o in outs]),
    )


def v_sort_merge(p, z, r):
    p, z, r = pad_slabs(p, z, r)
    outs = [
        jax.lax.sort((p[i], z[i], r[i]), num_keys=3, is_stable=False)
        for i in range(N_CAM)
    ]
    ops = (
        jnp.concatenate([o[0] for o in outs]),
        jnp.concatenate([o[1] for o in outs]),
        jnp.concatenate([o[2] for o in outs]),
    )
    seg = 2 * PAD
    while seg <= N_CAM * PAD:
        ops = bitonic_merge_level(ops, seg)
        seg *= 2
    return ops


def run(name, fn, reps=4):
    @jax.jit
    def chain(carry, p, z, r):
        def body(i, c):
            # Data-dependent perturbation (f32 carry → int, not foldable)
            # so iterations stay serialized through the sorts.
            pert = jax.lax.bitcast_convert_type(0.0 * c, jnp.int32)
            sp, sz, sr = fn(p ^ pert, z, r)
            acc = (sp[::64].astype(jnp.float32).sum()
                   + sz[::64].astype(jnp.float32).sum()
                   + sr[::64].astype(jnp.float32).sum())
            return acc * 1e-38 + 0.0 * c
        return jax.lax.fori_loop(0, INNER, body, carry)

    t0 = time.perf_counter()
    float(chain(jnp.float32(0), pix_a, z_a, rgb_a))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    c = jnp.float32(0)
    for _ in range(2):
        c = chain(c, pix_a, z_a, rgb_a)
    float(c)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = chain(c, pix_a, z_a, rgb_a)
        float(c)
        per.append((time.perf_counter() - t0) * 1e3 / INNER)
    print(f"{name}: p50 {np.percentile(per, 50):.2f} ms "
          f"(min {min(per):.2f})", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", file=sys.stderr)
    # Correctness first: merge == monolithic sort of the padded array.
    pp, zp, rp = pad_slabs(pix_a, z_a, rgb_a)
    want = jax.jit(v_sort_flat)(pp, zp, rp)
    got = jax.jit(v_sort_merge)(pix_a, z_a, rgb_a)
    for w, g, nm in zip(want, got, ("pix", "z", "rgb")):
        bad = int(jnp.sum(w != g))
        print(f"merge correctness [{nm}]: {bad} mismatches", flush=True)
        assert bad == 0, f"bitonic merge wrong on {nm}"
    run("sort3.26M (baseline)", v_sort_flat)
    run("8xsort407k (no merge)", v_sort_slabs)
    run("8xsort512k+bitonic merge", v_sort_merge)
