"""Sorted-slab z-buffer resolve: the Pallas replacement for scatter-min.

The z-buffered virtual-camera render (kernel_project_pointcloud +
atomicMinFloat, /root/reference/pointcloud_processing/src/kernels.cu:118-126,
:239-274) needs, per target pixel, the minimum-depth point among all points
projecting onto it. XLA lowers scatter-min as a serial update loop on TPU
(measured ~8.6 ns/update on v5e — 7.1 ms for the dual-camera 814k-entry
scatter, scaling linearly to 28 ms at 8 cameras), which made every previous
render mode scatter-bound.

This module replaces the scatter entirely:

  1. sort the (pixel, z-bits, packed-RGB) entry triples by pixel — a 1-key
     3-operand u32 sort measures ~1.1 ms at 814k on v5e (sorts are
     log-parallel; scatters are serial);
  2. after the sort, the entries of any contiguous pixel TILE form one
     contiguous slab; per-tile slab boundaries come from one vectorized
     searchsorted over the tile edges;
  3. a Pallas kernel walks one image tile per grid step, streaming its slab
     through VMEM with double-buffered DMA, and computes each pixel's
     winner with a vectorized masked min over (tile_px, chunk) blocks —
     no scatter, no gather, work proportional to entries + tiles.

Winner semantics are IDENTICAL to ops/render.project_zbuffer: minimum f32
depth (order-preserving positive-float bit pattern compared as i32), ties
broken by minimum packed RGB — the reference's racy color write
(kernels.cu:264-273) made deterministic.

Entries use i32 throughout: valid z > 0 means its IEEE-754 bit pattern is
a positive i32, so i32 order == f32 order, and INT32_MAX serves as the
invalid/empty sentinel (never a valid z or 24-bit RGB).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MAXI = 0x7FFFFFFF  # i32 sentinel: > any valid z bit pattern / RGB24

# Crossover for _exact_chunk_spans' broadcast-compare feed vs searchsorted
# (see its docstring); module-level so tests can exercise both branches.
_SPAN_COMPARE_BUDGET = 1 << 27


def _resolve_kernel(cs_ref, ce_ref, ent_hbm, minz_ref, rgb_ref, buf, sem,
                    *, tile_px: int, chunk: int):
    """One grid step resolves one tile of ``tile_px`` consecutive pixels.

    ent_hbm: (4, N) i32 in HBM — rows (sorted pixel, z bits, packed RGB,
    pad); the 4th row only exists to align HBM slices to the (4, 128) i32
    tile. cs/ce: per-tile first/last+1 chunk index into the entry axis.
    """
    t = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_px, 1), 0) + t * tile_px
    maxi = jnp.int32(_MAXI)
    cs = cs_ref[t]
    ce = ce_ref[t]

    def dma(slot, ci):
        off = pl.multiple_of(ci * chunk, chunk)
        return pltpu.make_async_copy(
            ent_hbm.at[:, pl.ds(off, chunk)], buf.at[slot], sem.at[slot]
        )

    @pl.when(cs < ce)
    def _():
        dma(0, cs).start()

    def body(ci, carry):
        minz, mrgb = carry
        slot = (ci - cs) & jnp.int32(1)

        @pl.when(ci + 1 < ce)
        def _():
            dma(1 - slot, ci + 1).start()

        dma(slot, ci).wait()
        pix = buf[slot, 0:1, :]
        zz = buf[slot, 1:2, :]
        rr = buf[slot, 2:3, :]
        # (tile_px, chunk) masked min: each sublane is one output pixel,
        # each lane one slab entry. Chunk-local winner (zc) then its
        # deterministic min-RGB tie-break (rc), merged into the carry.
        match = pix == rows
        zsel = jnp.where(match, zz, maxi)
        zc = jnp.min(zsel, axis=1, keepdims=True)
        rsel = jnp.where(match & (zsel == zc), rr, maxi)
        rc = jnp.min(rsel, axis=1, keepdims=True)
        better = zc < minz
        tie = zc == minz
        mrgb = jnp.where(better, rc, jnp.where(tie, jnp.minimum(mrgb, rc), mrgb))
        minz = jnp.minimum(minz, zc)
        return minz, mrgb

    init = (
        jnp.full((tile_px, 1), maxi, jnp.int32),
        jnp.full((tile_px, 1), maxi, jnp.int32),
    )
    minz, mrgb = jax.lax.fori_loop(cs, ce, body, init)
    minz_ref[:] = minz
    rgb_ref[:] = mrgb


def _resolve3_kernel(cs_ref, ce_ref, sp_hbm, sz_hbm, sr_hbm, minz_ref,
                     rgb_ref, buf, sem, *, tile_px: int, chunk: int):
    """Three-operand variant of :func:`_resolve_kernel`: the sorted
    (pixel, z-bits, RGB) arrays arrive as separate (C, 1, chunk) HBM
    operands — no (4, N) stack materialization on the XLA side. Winner
    semantics identical (min z-bits, ties → min packed RGB).

    buf: VMEM (2, 3, 1, chunk) — double-buffered slots × operand rows.
    sem: (2, 3) DMA semaphores (one per slot × operand; the three per-chunk
    copies are issued back-to-back and land concurrently).

    The tie-break select drops the original kernel's ``match &`` AND-pass:
    rsel compares zsel against zc' = (zc == MAX ? −1 : zc); −1 is never a
    z-bit pattern (valid depths are positive i32, invalid = MAX), so a
    no-match chunk contributes nothing without re-testing match.
    """
    t = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_px, 1), 0) + t * tile_px
    maxi = jnp.int32(_MAXI)
    cs = cs_ref[t]
    ce = ce_ref[t]

    def dma(slot, ci):
        off = pl.multiple_of(ci, 1)
        return [
            pltpu.make_async_copy(
                src.at[off], buf.at[slot, i], sem.at[slot, i]
            )
            for i, src in enumerate((sp_hbm, sz_hbm, sr_hbm))
        ]

    @pl.when(cs < ce)
    def _():
        for c in dma(0, cs):
            c.start()

    def body(ci, carry):
        minz, mrgb = carry
        slot = (ci - cs) & jnp.int32(1)

        @pl.when(ci + 1 < ce)
        def _():
            for c in dma(1 - slot, ci + 1):
                c.start()

        for c in dma(slot, ci):
            c.wait()
        pix = buf[slot, 0, 0:1, :]
        zz = buf[slot, 1, 0:1, :]
        rr = buf[slot, 2, 0:1, :]
        zsel = jnp.where(pix == rows, zz, maxi)
        zc = jnp.min(zsel, axis=1, keepdims=True)
        zcp = jnp.where(zc == maxi, jnp.int32(-1), zc)
        rsel = jnp.where(zsel == zcp, rr, maxi)
        rc = jnp.min(rsel, axis=1, keepdims=True)
        better = zc < minz
        tie = zc == minz
        mrgb = jnp.where(better, rc, jnp.where(tie, jnp.minimum(mrgb, rc), mrgb))
        minz = jnp.minimum(minz, zc)
        return minz, mrgb

    init = (
        jnp.full((tile_px, 1), maxi, jnp.int32),
        jnp.full((tile_px, 1), maxi, jnp.int32),
    )
    minz, mrgb = jax.lax.fori_loop(cs, ce, body, init)
    minz_ref[:] = minz
    rgb_ref[:] = mrgb


def _resolve_rgb_kernel(cs_ref, ce_ref, sp_hbm, sr_hbm, rgb_ref, buf, sem,
                        *, tile_px: int, chunk: int):
    """Image-only resolve: ONE select+min pass per chunk.

    Callers pre-reduce the winner search to a 3-key sort (pixel, z-bits,
    RGB) + first-of-run mask (see :func:`zresolve_winner_rgb`): each pixel
    then has AT MOST ONE entry whose pix id is valid, and that entry is the
    lexicographic (min z, tie -> min RGB) winner. The kernel only has to
    route it to its row — ``min(pix == row ? rgb : MAX)`` — so the full
    kernel (z-select + z-min + tie-select + rgb-min, 2 operand rows) drops
    to one select + one min over each (tile_px, chunk) block with 2 DMA'd
    operands instead of 3. Measured motivation: the resolve tail is
    proportional VPU work on the (P, C) blocks (double-resolve probe:
    +2.55 ms for a second resolve, r4), so halving the per-chunk passes is
    the one lever left after prefetch/geometry/sub-tiling all measured flat.
    """
    t = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_px, 1), 0) + t * tile_px
    maxi = jnp.int32(_MAXI)
    cs = cs_ref[t]
    ce = ce_ref[t]

    def dma(slot, ci):
        off = pl.multiple_of(ci, 1)
        return [
            pltpu.make_async_copy(
                src.at[off], buf.at[slot, i], sem.at[slot, i]
            )
            for i, src in enumerate((sp_hbm, sr_hbm))
        ]

    @pl.when(cs < ce)
    def _():
        for c in dma(0, cs):
            c.start()

    def body(ci, mrgb):
        slot = (ci - cs) & jnp.int32(1)

        @pl.when(ci + 1 < ce)
        def _():
            for c in dma(1 - slot, ci + 1):
                c.start()

        for c in dma(slot, ci):
            c.wait()
        pix = buf[slot, 0, 0:1, :]
        rr = buf[slot, 1, 0:1, :]
        rsel = jnp.where(pix == rows, rr, maxi)
        return jnp.minimum(mrgb, jnp.min(rsel, axis=1, keepdims=True))

    init = jnp.full((tile_px, 1), maxi, jnp.int32)
    rgb_ref[:] = jax.lax.fori_loop(cs, ce, body, init)


def zresolve_winner_rgb(
    pix: Array,
    zbits: Array,
    rgb: Array,
    n_px: int,
    tile_px: int = 256,
    chunk: int = 1024,
    interpret: bool = False,
) -> Array:
    """Per-pixel winner RGB only (no z-buffer output) — the fast path for
    consumers that publish just the fused image (the reference's fusion
    node publishes the fused color topic; its z-buffer is internal to the
    CUDA kernel, kernels.cu:239-274).

    Same winner semantics as :func:`zresolve_sorted_entries` (min z-bits,
    ties -> min packed RGB), restructured so the Pallas kernel does HALF
    the per-chunk vector work:

      1. sort 3-KEY on (pixel, z-bits, RGB) — the lexicographic winner of
         every pixel is then the FIRST entry of its run (measured: 3-key
         sort costs ~+0.2 ms over 1-key at 814k);
      2. mask every non-first entry's pixel id to the invalid sentinel
         (one elementwise shift-compare on the sorted array); positions
         are unchanged, so chunk spans from the UNMASKED sorted pixels
         still bound each tile's entries;
      3. the kernel routes each surviving singleton to its row with a
         single select+min pass (``_resolve_rgb_kernel``).

    Returns mrgb (n_px,) i32 — INT32_MAX where no entry covered the pixel
    (valid packed RGB is 24-bit, so the sentinel is unambiguous).
    """
    n = pix.shape[0]
    n_tiles = -(-n_px // tile_px)
    pad_px = n_tiles * tile_px

    n2 = -(-n // chunk) * chunk
    if n2 != n:
        pix = jnp.concatenate(
            [pix, jnp.full((n2 - n,), jnp.int32(_INVALID_PIX))]
        )
        fill = jnp.full((n2 - n,), jnp.int32(_MAXI))
        zbits = jnp.concatenate([zbits, fill])
        rgb = jnp.concatenate([rgb, fill])

    sp, sz, sr = jax.lax.sort((pix, zbits, rgb), num_keys=3,
                              is_stable=False)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sp[1:] != sp[:-1]]
    )
    spm = jnp.where(first, sp, jnp.int32(_INVALID_PIX))

    cs, ce = _exact_chunk_spans(sp, n_tiles, tile_px, chunk)
    n_chunks = sp.shape[0] // chunk
    sp3 = spm.reshape(n_chunks, 1, chunk)
    sr3 = sr.reshape(n_chunks, 1, chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_px, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, 1, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    (mrgb,) = pl.pallas_call(
        functools.partial(_resolve_rgb_kernel, tile_px=tile_px, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_px, 1), jnp.int32),
        ],
        interpret=interpret,
    )(cs, ce, sp3, sr3)
    return mrgb.reshape(-1)[:n_px]


def _exact_chunk_spans(sp: Array, n_tiles: int, tile_px: int, chunk: int):
    """Exact per-tile (cs, ce) chunk spans from the SORTED pixel array —
    without jnp.searchsorted.

    jnp.searchsorted's default binary search lowers to ~log2(N) SEQUENTIAL
    small gathers (≈20 dependent gather kernels at 814k entries — measured
    as the bulk of the 0.79 ms resolve feed). Two-level direct computation
    instead:

      1. chunk-start samples g[c] = sp[c·chunk] (a free reshape + column
         slice) locate each tile boundary's chunk with ONE broadcast
         compare + row-sum over the tiny (T+1, C) grid;
      2. one (T+1, chunk) ROW gather of the containing chunks + a second
         broadcast compare gives the exact within-chunk offset (row
         gathers cost per row on v5e — (T+1) rows is noise vs the 20
         sequential gathers they replace).

    Returns exactly searchsorted's starts split into (cs, ce) =
    (starts[:-1] // chunk, ceil(starts[1:] / chunk)).

    Scale guard: the two broadcast compares cost O((T+1)·C) + O((T+1)·chunk)
    — trivially small at the dual frame (~1.3M lanes of vector compare vs
    ~20 SEQUENTIAL gather kernels for searchsorted) but quadratic in the
    composed pixel space of ``batched_rig_fuse`` (B streams of an N-camera
    rig grow T and C together: 8×8-cam 720p ≈ 1.7e9 compares). Past the
    crossover the log-N binary search wins; both produce identical spans.
    """
    n = sp.shape[0]
    n_chunks = n // chunk
    if (n_tiles + 1) * (n_chunks + chunk) > _SPAN_COMPARE_BUDGET:
        bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_px
        starts = jnp.searchsorted(sp, bounds).astype(jnp.int32)
        return starts[:-1] // chunk, (starts[1:] + chunk - 1) // chunk
    sp2d = sp.reshape(n_chunks, chunk)
    g = sp2d[:, 0]  # (C,) first sorted pixel of each chunk
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_px  # (T+1,)
    # chunk containing each boundary: #{c : g[c] < bound} − 1, clipped.
    below = jnp.sum(
        (g[None, :] < bounds[:, None]).astype(jnp.int32), axis=1
    )
    cb = jnp.clip(below - 1, 0, n_chunks - 1)  # (T+1,)
    rows = sp2d[cb]  # (T+1, chunk) — one row gather
    w = jnp.sum((rows < bounds[:, None]).astype(jnp.int32), axis=1)
    starts = cb * chunk + w
    cs = starts[:-1] // chunk
    ce = (starts[1:] + chunk - 1) // chunk
    return cs, ce


def zresolve_sorted_entries(
    pix: Array,
    zbits: Array,
    rgb: Array | None,
    n_px: int,
    tile_px: int = 256,
    chunk: int = 1024,
    interpret: bool = False,
    legacy_feed: bool = False,
) -> Tuple[Array, Array]:
    """Per-pixel (min z-bits, RGB-of-winner) from UNSORTED entry triples.

    Args:
      pix: (N,) i32 flat target pixel per entry; invalid entries MUST carry
        a value >= the padded pixel count — use ``invalid_pixel_id`` (a
        constant past every supported pixel space).
      zbits: (N,) i32 bit pattern of the positive f32 depth (i32 order ==
        f32 order); INT32_MAX for invalid.
      rgb: (N,) i32 packed r<<16|g<<8|b; INT32_MAX for invalid. None when
        the caller only needs the depth winner (e.g. depth→color alignment)
        — drops the third sort operand (sort cost scales with operand
        count) and returns minz twice.
      n_px: number of real output pixels.

    Returns (minz_bits (n_px,) i32, rgb (n_px,) i32) — INT32_MAX where no
    entry landed.
    """
    n_tiles = -(-n_px // tile_px)
    pad_px = n_tiles * tile_px

    n = pix.shape[0]
    n2 = -(-n // chunk) * chunk
    if n2 != n:
        fill = jnp.full((n2 - n,), jnp.int32(_MAXI))
        pix = jnp.concatenate(
            [pix, jnp.full((n2 - n,), jnp.int32(_INVALID_PIX))]
        )
        zbits = jnp.concatenate([zbits, fill])
        if rgb is not None:
            rgb = jnp.concatenate([rgb, fill])

    if rgb is None:
        sp, sz = jax.lax.sort((pix, zbits), num_keys=1, is_stable=False)
        sr = sz
    else:
        sp, sz, sr = jax.lax.sort((pix, zbits, rgb), num_keys=1,
                                  is_stable=False)
    if legacy_feed:
        # Round-3 feed kept for A/B measurement: jnp.searchsorted bounds +
        # a materialized (4, N) stack through the original kernel.
        bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_px
        starts = jnp.searchsorted(sp, bounds).astype(jnp.int32)
        cs = starts[:-1] // chunk
        ce = (starts[1:] + chunk - 1) // chunk
        ent = jnp.stack([sp, sz, sr, sp])  # row 3 pads the (4, 128) tile
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec(
                    (tile_px, 1), lambda t, *_: (t, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tile_px, 1), lambda t, *_: (t, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 4, chunk), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        minz, mrgb = pl.pallas_call(
            functools.partial(_resolve_kernel, tile_px=tile_px, chunk=chunk),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((pad_px, 1), jnp.int32),
                jax.ShapeDtypeStruct((pad_px, 1), jnp.int32),
            ],
            interpret=interpret,
        )(cs, ce, ent)
        return minz.reshape(-1)[:n_px], mrgb.reshape(-1)[:n_px]

    cs, ce = _exact_chunk_spans(sp, n_tiles, tile_px, chunk)

    # Feed the kernel the three sorted arrays DIRECTLY (free reshapes to
    # (C, 1, chunk)) instead of materializing a (4, N) jnp.stack: the stack
    # wrote+read 16·N bytes per frame and existed only to satisfy HBM
    # sublane tiling. Three per-chunk DMAs (one per operand, separate
    # semaphores, issued back-to-back) replace the single (4, chunk) copy.
    n_chunks = sp.shape[0] // chunk
    sp3 = sp.reshape(n_chunks, 1, chunk)
    sz3 = sz.reshape(n_chunks, 1, chunk)
    sr3 = sr.reshape(n_chunks, 1, chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_px, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_px, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 3, 1, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    minz, mrgb = pl.pallas_call(
        functools.partial(_resolve3_kernel, tile_px=tile_px, chunk=chunk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_px, 1), jnp.int32),
            jax.ShapeDtypeStruct((pad_px, 1), jnp.int32),
        ],
        interpret=interpret,
    )(cs, ce, sp3, sz3, sr3)
    return minz.reshape(-1)[:n_px], mrgb.reshape(-1)[:n_px]


def _streams_kernel(cs_ref, ce_ref, ent_hbm, minz_ref, rgb_ref, buf, sem,
                    *, tile_px: int, chunk: int, n_streams: int,
                    n_tiles: int):
    """Multi-stream resolve: one grid step resolves one pixel tile against
    S INDEPENDENTLY-SORTED entry streams.

    ent_hbm: (S, 4, N) i32 — per-stream sorted (pixel, z, RGB, pad) rows.
    cs/ce: (S·n_tiles,) per-(stream, tile) chunk spans, stream-major.
    Accumulates all S slabs into ONE (minz, rgb) carry, so winner semantics
    are identical to the single-stream kernel over the concatenated
    entries. Rationale: lax.sort cost grows super-linearly (measured on
    v5e: 3.26M 3-operand = 5.25 ms vs 8×407k = 4.03 in one program), so an
    8-camera rig sorts per camera and lets the resolve do the merge.

    The stream loop is STATICALLY UNROLLED with per-stream (2, 4, chunk)
    VMEM slots, and every stream's FIRST chunk DMA is issued up front: S×
    more chunk transfers than the single-stream kernel would otherwise
    serialize S× the per-chunk DMA latency per tile (a sequential-stream
    variant with one shared buffer measured 25 ms on the 8-camera rig —
    2.3× WORSE than the single big sort it replaced).
    """
    t = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_px, 1), 0) + t * tile_px
    maxi = jnp.int32(_MAXI)
    spans = [
        (cs_ref[s * n_tiles + t], ce_ref[s * n_tiles + t])
        for s in range(n_streams)
    ]

    def dma(s, slot, ci):
        off = pl.multiple_of(ci * chunk, chunk)
        return pltpu.make_async_copy(
            ent_hbm.at[s, :, pl.ds(off, chunk)], buf.at[s, slot],
            sem.at[s, slot],
        )

    # Issue every stream's first chunk before consuming any: the S first
    # transfers land concurrently instead of back-to-back.
    for s in range(n_streams):
        cs_s, ce_s = spans[s]

        @pl.when(cs_s < ce_s)
        def _(s=s, cs_s=cs_s):
            dma(s, 0, cs_s).start()

    init = (
        jnp.full((tile_px, 1), maxi, jnp.int32),
        jnp.full((tile_px, 1), maxi, jnp.int32),
    )
    carry = init
    for s in range(n_streams):
        cs_s, ce_s = spans[s]

        def chunk_body(ci, c, s=s, cs_s=cs_s, ce_s=ce_s):
            minz, mrgb = c
            slot = (ci - cs_s) & jnp.int32(1)

            @pl.when(ci + 1 < ce_s)
            def _():
                dma(s, 1 - slot, ci + 1).start()

            dma(s, slot, ci).wait()
            pix = buf[s, slot, 0:1, :]
            zz = buf[s, slot, 1:2, :]
            rr = buf[s, slot, 2:3, :]
            match = pix == rows
            zsel = jnp.where(match, zz, maxi)
            zc = jnp.min(zsel, axis=1, keepdims=True)
            rsel = jnp.where(match & (zsel == zc), rr, maxi)
            rc = jnp.min(rsel, axis=1, keepdims=True)
            better = zc < minz
            tie = zc == minz
            mrgb = jnp.where(
                better, rc, jnp.where(tie, jnp.minimum(mrgb, rc), mrgb)
            )
            minz = jnp.minimum(minz, zc)
            return minz, mrgb

        carry = jax.lax.fori_loop(cs_s, ce_s, chunk_body, carry)
    minz, mrgb = carry
    minz_ref[:] = minz
    rgb_ref[:] = mrgb


def zresolve_sorted_streams(
    pix: Array,
    zbits: Array,
    rgb: Array | None,
    n_px: int,
    tile_px: int = 256,
    chunk: int = 256,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Multi-stream variant of :func:`zresolve_sorted_entries`.

    Args are (S, N)-shaped: stream s's entries are sorted INDEPENDENTLY
    (S small sorts instead of one S·N sort — lax.sort scales
    super-linearly on v5e) and the kernel merges all S sorted slabs per
    pixel tile. Winner semantics identical to the single-stream resolve
    over the concatenated entries. Default chunk 256 (vs 1024): per-stream
    slabs are S× thinner, and chunk granularity is per (stream, tile).
    """
    n_streams, n = pix.shape
    n_tiles = -(-n_px // tile_px)
    pad_px = n_tiles * tile_px

    n2 = -(-n // chunk) * chunk
    if n2 != n:
        pix = jnp.concatenate(
            [pix, jnp.full((n_streams, n2 - n), jnp.int32(_INVALID_PIX))],
            axis=1,
        )
        fill = jnp.full((n_streams, n2 - n), jnp.int32(_MAXI))
        zbits = jnp.concatenate([zbits, fill], axis=1)
        if rgb is not None:
            rgb = jnp.concatenate([rgb, fill], axis=1)

    # Per-stream sorts, python-unrolled: a batched lax.sort along axis 1 is
    # catastrically slower on v5e (measured 6.0 ms for (2, 407k) vs 2×
    # 0.55 ms separate) — never add batch dims to sort.
    ents, css, ces = [], [], []
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_px
    for s in range(n_streams):
        if rgb is None:
            sp, sz = jax.lax.sort((pix[s], zbits[s]), num_keys=1,
                                  is_stable=False)
            sr = sz
        else:
            sp, sz, sr = jax.lax.sort((pix[s], zbits[s], rgb[s]),
                                      num_keys=1, is_stable=False)
        starts = jnp.searchsorted(sp, bounds).astype(jnp.int32)
        css.append(starts[:-1] // chunk)
        ces.append((starts[1:] + chunk - 1) // chunk)
        ents.append(jnp.stack([sp, sz, sr, sp]))
    ent = jnp.stack(ents)  # (S, 4, N2)
    cs = jnp.concatenate(css)  # stream-major (S * n_tiles,)
    ce = jnp.concatenate(ces)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec(
                (tile_px, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_px, 1), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_streams, 2, 4, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((n_streams, 2)),
        ],
    )
    minz, mrgb = pl.pallas_call(
        functools.partial(
            _streams_kernel, tile_px=tile_px, chunk=chunk,
            n_streams=n_streams, n_tiles=n_tiles,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_px, 1), jnp.int32),
            jax.ShapeDtypeStruct((pad_px, 1), jnp.int32),
        ],
        interpret=interpret,
    )(cs, ce, ent)
    return minz.reshape(-1)[:n_px], mrgb.reshape(-1)[:n_px]


# Beyond any padded pixel range (images + rig/batch offsets stay well under
# 2^30 pixels) but far from i32 overflow in the sort.
_INVALID_PIX = 0x40000000


def invalid_pixel_id(n_px: int, tile_px: int = 256) -> int:
    """Pixel id that routes an entry past every tile (use for masked-out
    points BEFORE calling zresolve_sorted_entries).

    A large constant rather than the caller's padded pixel count: composed
    paths (batched_rig_fuse) resolve entries built against a PER-STREAM
    grid over a batch-wide pixel space, and a per-grid pad id would land on
    a real pixel of the next stream — every invalid entry would then stream
    through one tile's slab loop (measured ~2× resolve work; the output
    stayed correct only because invalid z-bits equal the empty sentinel).
    """
    return _INVALID_PIX
