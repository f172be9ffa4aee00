"""Sorted-slab segment reduce: sum + arg-min over hash-table slots.

The voxel-grid build (ops/voxel.py build_voxel_grid — the TPU-shaped
replacement for the per-point atomicAdd accumulation inside FastVGICPCuda
and PCL's ApproximateVoxelGrid, SURVEY.md §2.7 items 4-5) needs, per hash
slot, the SUM of each point's 10 statistic channels (weight, first moment
×3, symmetric second moment ×6) plus the minimum point index (the
collision-check representative). As 11 flat XLA scatters this is a serial
~8.6 ns/update loop on v5e — ~10 ms for a 100k-point cloud — and it was the
dominant cost of a warm GICP tick.

Same trick as the render's z-resolve (ops/pallas/zresolve_pallas.py):

  1. sort (slot, point-index) pairs — a 1-key 2-operand u32 sort is
     log-parallel and costs ~0.3 ms at 100k entries;
  2. ONE row gather pulls each sorted point's statistic row (row gathers
     cost per row, not per byte, so 10 channels ride for the price of one);
  3. a Pallas kernel walks one slot tile per grid step, streaming the
     tile's sort-contiguous entry slab through VMEM with double-buffered
     DMA; each chunk contributes a masked per-channel sum (VPU work — the
     match matrix is (tile_slots, chunk) and every entry hits exactly one
     sublane) and a masked min of the point index.

No scatter anywhere; work is proportional to entries + slots.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_MAXI = 0x7FFFFFFF  # i32 sentinel for the arg-min channel


def _segsum_kernel(cs_ref, ce_ref, slot_hbm, val_hbm, sum_ref, rep_ref,
                   ibuf, fbuf, sem, *, tile_slots: int, chunk: int,
                   n_chan: int):
    """One grid step reduces one tile of ``tile_slots`` consecutive slots.

    slot_hbm: (4, N) i32 — rows (sorted slot, sorted point index, pad, pad);
    val_hbm: (C_pad, N) f32 statistic channels in sorted order. cs/ce:
    per-tile first/last+1 chunk index into the entry axis.
    """
    t = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_slots, 1), 0) + t * tile_slots
    maxi = jnp.int32(_MAXI)
    cs = cs_ref[t]
    ce = ce_ref[t]
    c_pad = val_hbm.shape[0]

    def dma(slot, ci):
        off = pl.multiple_of(ci * chunk, chunk)
        return (
            pltpu.make_async_copy(
                slot_hbm.at[:, pl.ds(off, chunk)], ibuf.at[slot], sem.at[slot, 0]
            ),
            pltpu.make_async_copy(
                val_hbm.at[:, pl.ds(off, chunk)], fbuf.at[slot], sem.at[slot, 1]
            ),
        )

    @pl.when(cs < ce)
    def _():
        for c in dma(0, cs):
            c.start()

    def body(ci, carry):
        sums, rep = carry
        slot = (ci - cs) & jnp.int32(1)

        @pl.when(ci + 1 < ce)
        def _():
            for c in dma(1 - slot, ci + 1):
                c.start()

        for c in dma(slot, ci):
            c.wait()
        sl = ibuf[slot, 0:1, :]
        pi = ibuf[slot, 1:2, :]
        match = sl == rows  # (tile_slots, chunk): one hit sublane per entry
        # Per-channel masked sums on the VPU. The channel loop is unrolled
        # (static n_chan); each iteration is one (tile_slots, chunk) select
        # + lane reduction — ~0.3 ms total for a 100k-entry build, far below
        # the sort+gather cost, so no MXU formulation is needed.
        parts = []
        for c in range(n_chan):
            v = fbuf[slot, c:c + 1, :]
            parts.append(
                jnp.sum(jnp.where(match, v, 0.0), axis=1, keepdims=True)
            )
        for c in range(n_chan, c_pad):
            parts.append(jnp.zeros((tile_slots, 1), jnp.float32))
        sums = sums + jnp.concatenate(parts, axis=1)
        rep = jnp.minimum(rep, jnp.min(jnp.where(match, pi, maxi), axis=1,
                                       keepdims=True))
        return sums, rep

    init = (
        jnp.zeros((tile_slots, c_pad), jnp.float32),
        jnp.full((tile_slots, 1), maxi, jnp.int32),
    )
    sums, rep = jax.lax.fori_loop(cs, ce, body, init)
    sum_ref[:] = sums
    rep_ref[:] = rep


def segsum_sorted(
    slot: Array,
    values: Array,
    n_slots: int,
    tile_slots: int = 256,
    chunk: int = 1024,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Per-slot channel sums + min entry index from UNSORTED entries.

    Args:
      slot: (N,) i32 target slot per entry; route invalid entries to any
        id >= ``padded_slots(n_slots, tile_slots)`` (e.g. the padded count
        itself) so they sort past every tile.
      values: (N, C) f32 statistic channels (C <= 16).
      n_slots: number of real output slots.

    Returns:
      sums: (n_slots, C) f32 — per-slot channel sums (0 where empty);
      rep: (n_slots,) i32 — minimum entry index per slot (INT32_MAX where
        empty), the deterministic representative for collision checks.
    """
    n, n_chan = values.shape
    if n_chan > 16:
        # ValueError, not assert (gone under -O): an oversized channel
        # count would overflow the (C_pad, chunk) VMEM slab silently.
        raise ValueError(
            f"{n_chan} channels > 16: capped by the (C_pad, chunk) VMEM slab"
        )
    c_pad = 8 * (-(-n_chan // 8))  # f32 sublane tile is 8
    n_tiles = -(-n_slots // tile_slots)
    pad_slots = n_tiles * tile_slots

    n2 = -(-n // chunk) * chunk
    if n2 != n:
        slot = jnp.concatenate(
            [slot, jnp.full((n2 - n,), jnp.int32(pad_slots))]
        )
    iota = jnp.arange(n2, dtype=jnp.int32)

    ss, si = jax.lax.sort((slot.astype(jnp.int32), iota), num_keys=1,
                          is_stable=False)
    # ONE row gather brings the statistic channels into sorted order
    # (clipped for the padding tail — those rows never match a real slot).
    rows = values[jnp.minimum(si, n - 1)].astype(jnp.float32)
    if c_pad != n_chan:
        rows = jnp.pad(rows, ((0, 0), (0, c_pad - n_chan)))

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * tile_slots
    starts = jnp.searchsorted(ss, bounds).astype(jnp.int32)
    cs = starts[:-1] // chunk
    ce = (starts[1:] + chunk - 1) // chunk
    ent_i = jnp.stack([ss, si, ss, ss])  # rows 2-3 pad the (4, 128) HBM tile
    ent_f = rows.T  # (C_pad, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_slots, c_pad), lambda t, *_: (t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_slots, 1), lambda t, *_: (t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4, chunk), jnp.int32),
            pltpu.VMEM((2, c_pad, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    sums, rep = pl.pallas_call(
        functools.partial(
            _segsum_kernel, tile_slots=tile_slots, chunk=chunk, n_chan=n_chan
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pad_slots, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((pad_slots, 1), jnp.int32),
        ],
        interpret=interpret,
    )(cs, ce, ent_i, ent_f)
    return sums[:n_slots, :n_chan], rep.reshape(-1)[:n_slots]


def padded_slots(n_slots: int, tile_slots: int = 256) -> int:
    """Slot id that routes an entry past every tile (use for invalid
    entries BEFORE calling segsum_sorted)."""
    return -(-n_slots // tile_slots) * tile_slots
