"""A/B on-chip: N-camera rig fuse with-zbuf vs image-only resolve
(emit_zbuf=False), plus geometry variants — the new 3-operand kernel is
geometry-flat on the dual, so re-probe the rig (4x the entries).

VERDICT item 6 target: 8-cam < 9 ms (round-3 baseline 10.8)."""
import dataclasses
import functools
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import tpu_check
from pointcloud_depthfusion_tpu.fusion.pipeline import FusionConfig
from pointcloud_depthfusion_tpu.parallel import mesh as M
import pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas as zp
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

INNER = 25
n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
w = int(sys.argv[2]) if len(sys.argv) > 2 else 848
h = int(sys.argv[3]) if len(sys.argv) > 3 else 480
intr, rig_args = tpu_check._build_rig(n, w, h)
cfg = FusionConfig.create(vertical_image=False, mirror_image=False,
                          filter_fused_color=False, render_mode="tiled")
cfg_img = dataclasses.replace(cfg, emit_zbuf=False)
ORIG_W = zp.zresolve_winner_rgb
ORIG_E = zp.zresolve_sorted_entries


def run(name, fn, reps=4):
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
    print(f"{name}: p50 {np.percentile(per, 50):.2f} ms (min {min(per):.2f})",
          flush=True)


run(f"rig{n} WITH zbuf (256,1024)", M.rig_fuse(intr, intr, cfg))
run(f"rig{n} image-only (256,1024)", M.rig_fuse(intr, intr, cfg_img))
for tp, ck in ((128, 1024), (512, 1024), (128, 512)):
    zp.zresolve_winner_rgb = functools.partial(ORIG_W, tile_px=tp, chunk=ck)
    try:
        run(f"rig{n} image-only ({tp},{ck})", M.rig_fuse(intr, intr, cfg_img))
    finally:
        zp.zresolve_winner_rgb = ORIG_W
