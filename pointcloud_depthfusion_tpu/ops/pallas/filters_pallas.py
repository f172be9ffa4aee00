"""Pallas TPU kernels for the image-filter hot ops.

Hand-tiled VMEM kernels for the per-frame filters. An 848×480 uint8 plane is
~0.4 MB — the whole plane fits in VMEM, so each filter is a single
grid-free kernel: one HBM→VMEM load, the full stencil in registers, one
store. Compared to the jnp formulations, this pins the working set on-chip
and avoids materializing shifted copies in HBM.

All kernels match the jnp ops in ops/filters.py bit-for-bit (same border
convention: interior ROI computed, border passes through). CPU tests run
them with interpret=True.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _median9(p):
    def s(a, b):
        return jnp.minimum(a, b), jnp.maximum(a, b)

    p = list(p)
    p[1], p[2] = s(p[1], p[2]); p[4], p[5] = s(p[4], p[5]); p[7], p[8] = s(p[7], p[8])
    p[0], p[1] = s(p[0], p[1]); p[3], p[4] = s(p[3], p[4]); p[6], p[7] = s(p[6], p[7])
    p[1], p[2] = s(p[1], p[2]); p[4], p[5] = s(p[4], p[5]); p[7], p[8] = s(p[7], p[8])
    p[0], p[3] = s(p[0], p[3]); p[5], p[8] = s(p[5], p[8]); p[4], p[7] = s(p[4], p[7])
    p[3], p[6] = s(p[3], p[6]); p[1], p[4] = s(p[1], p[4]); p[2], p[5] = s(p[2], p[5])
    p[4], p[7] = s(p[4], p[7]); p[4], p[2] = s(p[4], p[2]); p[6], p[4] = s(p[6], p[4])
    p[4], p[2] = s(p[4], p[2])
    return p[4]


def _median3x3_kernel(in_ref, out_ref):
    # int32 lanes: Mosaic's vector min/max doesn't lower for i16 on all
    # shapes (observed on v5e), and i32 costs the same here.
    x = in_ref[:].astype(jnp.int32)
    h, w = x.shape
    # 9 shifted interior views (static slices, all (h-2, w-2)).
    taps = [
        x[dy : h - 2 + dy, dx : w - 2 + dx]
        for dy in range(3)
        for dx in range(3)
    ]
    med = _median9(taps).astype(jnp.uint8)
    out_ref[:] = in_ref[:]
    out_ref[1 : h - 1, 1 : w - 1] = med


@functools.partial(jax.jit, static_argnames=("interpret",))
def median3x3_plane(plane: Array, interpret: bool = False) -> Array:
    """3×3 median of a single uint8 plane (border passes through)."""
    return pl.pallas_call(
        _median3x3_kernel,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(plane)


def _gauss3x3_kernel(in_ref, out_ref):
    # u8 -> i32 -> f32: Mosaic has no direct u8->f32 cast.
    x = in_ref[:].astype(jnp.int32).astype(jnp.float32)
    h, w = x.shape
    # separable [1 2 1]/4 vertically then horizontally on the interior
    rows = x[0 : h - 2, :] + 2.0 * x[1 : h - 1, :] + x[2:h, :]
    interior = (
        rows[:, 0 : w - 2] + 2.0 * rows[:, 1 : w - 1] + rows[:, 2:w]
    ) * (1.0 / 16.0)
    out_ref[:] = in_ref[:]
    # f32 -> i32 -> u8 (no direct f32->u8 cast in Mosaic). Half-up round
    # (floor(x+0.5)) to match NPP's fixed-point (sum + 8) >> 4 and the XLA
    # twin ops/filters.gauss_filter — x.5 ties are exact here.
    out_ref[1 : h - 1, 1 : w - 1] = (
        jnp.clip(jnp.floor(interior + 0.5), 0.0, 255.0)
        .astype(jnp.int32)
        .astype(jnp.uint8)
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def gauss3x3_plane(plane: Array, interpret: bool = False) -> Array:
    """3×3 binomial Gauss of a single uint8 plane (border passes through)."""
    return pl.pallas_call(
        _gauss3x3_kernel,
        out_shape=jax.ShapeDtypeStruct(plane.shape, plane.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(plane)


def filter_color_pallas(
    color: Array, use_median: bool, interpret: bool = False
) -> Array:
    """Drop-in Pallas variant of ops.filters.filter_color ((H, W, 3) u8).

    Channels run as a Python-unrolled loop over (H, W) planes — vmapped
    elementwise pipelines lower ~10× slower on v5e (batched-iota rule,
    CLAUDE.md) and the stack happens once at the end.
    """
    fn = median3x3_plane if use_median else gauss3x3_plane
    return jnp.stack(
        [fn(color[..., c], interpret=interpret) for c in range(3)], axis=-1
    )


def _shift_replicate(x, dy: int, dx: int):
    """Static shift with replicate border via concatenation (gathers do not
    lower inside Mosaic kernels)."""
    h, w = x.shape
    if dy > 0:
        x = jnp.concatenate([x[dy:, :]] + [x[h - 1 :, :]] * dy, axis=0)
    elif dy < 0:
        x = jnp.concatenate([x[:1, :]] * (-dy) + [x[: h + dy, :]], axis=0)
    if dx > 0:
        x = jnp.concatenate([x[:, dx:]] + [x[:, w - 1 :]] * dx, axis=1)
    elif dx < 0:
        x = jnp.concatenate([x[:, :1]] * (-dx) + [x[:, : w + dx]], axis=1)
    return x


def _minmax_1d(x, radius: int, axis: int, op):
    acc = x
    for d in range(1, radius + 1):
        if axis == 0:
            acc = op(acc, _shift_replicate(x, d, 0))
            acc = op(acc, _shift_replicate(x, -d, 0))
        else:
            acc = op(acc, _shift_replicate(x, 0, d))
            acc = op(acc, _shift_replicate(x, 0, -d))
    return acc


def _erode_dilate_kernel(in_ref, out_ref, *, dilate: bool):
    # The 5×5 SE with zeroed corners (kernels.cu:413-418) is exactly the
    # union of a 3×5 and a 5×3 box, each separable — 4 cheap 1-D min/max
    # passes instead of 21 full-plane temporaries (which blew the 16 MB
    # VMEM budget).
    x = in_ref[:].astype(jnp.int32)
    op = jnp.maximum if dilate else jnp.minimum
    a = _minmax_1d(_minmax_1d(x, 2, 1, op), 1, 0, op)  # 3 tall × 5 wide
    b = _minmax_1d(_minmax_1d(x, 1, 1, op), 2, 0, op)  # 5 tall × 3 wide
    # union SE: dilation = max of the two box dilations; erosion = min of
    # the two box erosions.
    out_ref[:] = op(a, b).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("dilate", "interpret"))
def morph_plane(mask_u8: Array, dilate: bool, interpret: bool = False) -> Array:
    """One erosion/dilation pass with the 21-point SE on a uint8 0/1 mask."""
    return pl.pallas_call(
        functools.partial(_erode_dilate_kernel, dilate=dilate),
        out_shape=jax.ShapeDtypeStruct(mask_u8.shape, mask_u8.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(mask_u8)
