"""Benchmark: dual-848×480 deproject+fuse+reproject on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms", "vs_baseline": ...}

The baseline is the BASELINE.md target: < 11 ms/frame (≥ 90 FPS) for the
dual-848×480 end-to-end fused frame on one TPU v5e chip. ``vs_baseline`` is
the speedup factor vs that 11 ms budget (>1 = beating the target).

Run on the default backend (the axon-tunneled TPU in this environment);
``--cpu`` forces CPU for a smoke run. Extra detail (p95, registration solve
time, packed-variant timing) goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--width", type=int, default=848)
    parser.add_argument("--height", type=int, default=480)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import __graft_entry__ as graft

    step, (left, right, t_rl, config) = graft._build_fusion(args.width, args.height)
    fused = jax.jit(step)

    print(f"bench devices: {jax.devices()}", file=sys.stderr)

    # Warmup / compile.
    t0 = time.perf_counter()
    out = fused(left, right, t_rl, config)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    for _ in range(args.warmup):
        jax.block_until_ready(fused(left, right, t_rl, config))

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fused(left, right, t_rl, config))
        times.append((time.perf_counter() - t0) * 1e3)
    times = np.asarray(times)
    p50 = float(np.percentile(times, 50))
    p95 = float(np.percentile(times, 95))
    print(
        f"fused dual-{args.width}x{args.height}: p50 {p50:.3f} ms  "
        f"p95 {p95:.3f} ms  min {times.min():.3f} ms",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": f"fused_ms_per_frame_dual_{args.width}x{args.height}",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(11.0 / p50, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
