"""Sharded 720p rig throughput extrapolation (VERDICT r4 item 4).

The 4-camera 1280×720 rig runs 12.8 ms image-only on ONE chip (78 FPS —
under the ≥90 FPS stretch); every single-chip lever is measured dead
(bitonic merge 254 ms, per-slab sorts ±0, partition≈sort — CLAUDE.md r4).
The designed answer is the camera-sharded mesh (one camera per device,
rig_fuse_sharded): per-device work is then EXACTLY a 1-camera tiled rig
render emitting (minz, mrgb), plus two pmin collectives over the fused
buffers and the replicated unpack.

This probe measures, single-chip on the real v5e:
  * rig_fuse with n=1 camera @1280×720, emit_zbuf=True — the per-device
    body+unpack of the sharded rig (any camera count);
  * n=2 and n=4 @1280×720 for the single-chip scaling curve alongside;
and prints the extrapolated camera-sharded ms/frame =
  per_device_1cam + merge_estimate, where the merge is 2 pmin collectives
over (921600,) i32 buffers (2 × 3.7 MB). On a v5e pod slice the all-reduce
rides ICI at ~100 GB/s/link: ≈ 0.1-0.3 ms for 4-8 devices — call it 0.3 ms
conservatively (it cannot be measured on this single-chip tunnel; the CPU
8-device mesh validates correctness, not ICI time).
"""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
import tpu_check
from pointcloud_depthfusion_tpu.fusion.pipeline import FusionConfig
from pointcloud_depthfusion_tpu.parallel import mesh as M
from pointcloud_depthfusion_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

INNER = 25
w = int(sys.argv[1]) if len(sys.argv) > 1 else 1280
h = int(sys.argv[2]) if len(sys.argv) > 2 else 720
cfg = FusionConfig.create(vertical_image=False, mirror_image=False,
                          filter_fused_color=False, render_mode="tiled")

results = {}


def run(name, n, reps=4):
    intr, rig_args = tpu_check._build_rig(n, w, h)
    fn = M.rig_fuse(intr, intr, cfg)

    @jax.jit
    def chain(carry, d, c, s, p):
        def body(i, cc):
            out = fn(d, c, s + 0.0 * cc, p)
            return out.astype(jnp.float32).sum() * 1e-38 + 0.0 * cc

        return jax.lax.fori_loop(0, INNER, body, carry)

    t0 = time.perf_counter()
    float(chain(jnp.float32(0), *rig_args))
    print(f"  [{name}] compile+first {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    c = jnp.float32(0)
    for _ in range(2):
        c = chain(c, *rig_args)
    float(c)
    per = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = chain(c, *rig_args)
        float(c)
        per.append((time.perf_counter() - t0) * 1e3 / INNER)
    p50 = float(np.percentile(per, 50))
    results[name] = p50
    print(f"{name}: p50 {p50:.2f} ms (min {min(per):.2f})", flush=True)


print(f"devices: {jax.devices()}", file=sys.stderr)
run(f"rig1 {w}x{h} with-zbuf (per-device sharded body)", 1)
run(f"rig2 {w}x{h} with-zbuf", 2)
run(f"rig4 {w}x{h} with-zbuf (single-chip reference)", 4)

per_dev = results[f"rig1 {w}x{h} with-zbuf (per-device sharded body)"]
merge_est = 0.3  # 2 pmin over 2×3.7 MB on ICI, conservative
print(
    f"\ncamera-sharded extrapolation ({w}x{h}, 1 camera/device): "
    f"per-device {per_dev:.2f} ms + merge ≈{merge_est} ms "
    f"→ ≈{per_dev + merge_est:.2f} ms/frame "
    f"({1e3 / (per_dev + merge_est):.0f} FPS) for ANY camera count",
    flush=True,
)
