"""Z-buffered point-cloud projection (virtual-camera rendering).

TPU-native replacement for kernel_project_pointcloud + atomicMinFloat
(kernels.cu:118-126, :239-274, host wrapper :577-592). The CUDA design —
per-point atomics with a racy color store — becomes a deterministic
scatter-min formulation:

  1. scatter-min the float32 depth of every valid point into a flat z-buffer
     (invalid points are routed to a dump slot past the image);
  2. gather each point's winning depth and mark the points that achieved it;
  3. scatter-min the *packed RGB* of winning points, which both resolves
     depth ties deterministically (smallest packed color wins) and fixes the
     reference's benign race (kernels.cu:264-273) documented in SURVEY.md §7.

There is also a single-scatter fast path (`packed_single_scatter=True`) that
quantizes depth to 16 bits and packs depth+RGB565 into one uint32 key — one
scatter instead of two plus a gather — for latency-critical paths that can
tolerate 5/6/5 color.

The *indexed* variant (`project_zbuffer_indexed*`) is the ≤1e-3-fidelity
fast path: ONE scatter of a (quantized-z | point-index) key selects the
winner, then two gathers recover the winner's EXACT uint8 RGB888 and EXACT
float32 depth. The only approximation is winner *selection*: a point whose
true depth is within one quantization step (< (z_far-z_near)/2^zq_bits,
0.92 mm for the default 0.25–4.0 m window with 20-bit indices) of the true
minimum may win instead. Reported color/depth are always exact values of
that near-minimal point, so output error is bounded by one step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.core.camera import Intrinsics

Array = jax.Array

def compute_pixel_indices(
    points: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
) -> Tuple[Array, Array, Array]:
    """Project points to integer pixel indices with bounds masking.

    Rounding matches the reference exactly: ``(int)(x + 0.5f)`` is a C cast,
    i.e. truncation toward zero (kernels.cu:249-250) — not floor — which
    matters for the -0.5 < x < 0 sliver at the image border.

    Returns (flat_index, z, in_bounds) where flat_index ∈ [0, W*H] with W*H
    used as the dump slot for masked-out points.
    """
    w, h = intrinsics.width, intrinsics.height
    z = points[..., 2]
    pos_z = z > 0
    safe_z = jnp.where(pos_z, z, 1.0)
    image_x = intrinsics.ppx + intrinsics.fx * points[..., 0] / safe_z
    image_y = intrinsics.ppy + intrinsics.fy * points[..., 1] / safe_z
    # float->int conversion truncates toward zero in both C and XLA, so the
    # reference's acceptance of the (-1.5, 0) sliver onto pixel 0 is
    # reproduced exactly (kernels.cu:249-253).
    px = (image_x + 0.5).astype(jnp.int32)
    py = (image_y + 0.5).astype(jnp.int32)
    in_bounds = (
        valid
        & pos_z
        & (px >= 0)
        & (py >= 0)
        & (px <= w - 1)
        & (py <= h - 1)
    )
    if mirror:
        px = (w - 1) - px
    flat = jnp.where(in_bounds, py * w + px, w * h)
    return flat, z, in_bounds


def compute_pixel_indices_planar(
    x: Array,
    y: Array,
    z: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
) -> Tuple[Array, Array, Array]:
    """Planar (structure-of-arrays) variant of :func:`compute_pixel_indices`.

    x/y/z/valid are (H, W)-shaped planes (or any matching shape); keeping
    the lane dimension = image width instead of the xyz triple lets the VPU
    vectorize the projection math (the (N, 3) layout puts 3 in the lane
    dimension and runs an order of magnitude below peak).
    """
    w, h = intrinsics.width, intrinsics.height
    pos_z = z > 0
    inv_z = 1.0 / jnp.where(pos_z, z, 1.0)
    image_x = intrinsics.ppx + intrinsics.fx * x * inv_z
    image_y = intrinsics.ppy + intrinsics.fy * y * inv_z
    px = (image_x + 0.5).astype(jnp.int32)
    py = (image_y + 0.5).astype(jnp.int32)
    in_bounds = (
        valid & pos_z & (px >= 0) & (py >= 0) & (px <= w - 1) & (py <= h - 1)
    )
    if mirror:
        px = (w - 1) - px
    flat = jnp.where(in_bounds, py * w + px, w * h)
    return flat, z, in_bounds


def _decode_packed_planes(buf: Array, z_near, z_far):
    """Decode a flat packed (zq14|RGB666) min-buffer into (r, g, b) u8
    planes + f32 zbuf (FLT_MAX where uncovered, color black).

    The ONE decode for the packed bit layout — every packed render path
    (:func:`unpack_packed_buffer`, :func:`project_zbuffer_packed_planar`,
    :func:`project_zbuffer_packed`, parallel.mesh's rig fold) must go
    through here so a layout change can never leave a stale twin.
    """
    z_levels = jnp.float32((1 << 14) - 1)
    sentinel = jnp.uint32(0xFFFFFFFF)
    covered = buf != sentinel
    buf = jnp.where(covered, buf, 0)  # uncovered pixels decode to black
    r6 = (buf >> 12) & 0x3F
    g6 = (buf >> 6) & 0x3F
    b6 = buf & 0x3F
    rp = ((r6 << 2) | (r6 >> 4)).astype(jnp.uint8)
    gp = ((g6 << 2) | (g6 >> 4)).astype(jnp.uint8)
    bp = ((b6 << 2) | (b6 >> 4)).astype(jnp.uint8)
    z_near = jnp.asarray(z_near, jnp.float32)
    z_far = jnp.asarray(z_far, jnp.float32)
    zq = (buf >> 18).astype(jnp.float32) / z_levels * (z_far - z_near) + z_near
    zbuf = jnp.where(covered, zq, jnp.float32(jnp.finfo(jnp.float32).max))
    return rp, gp, bp, zbuf


def decode_winner_planes(covered: Array, mrgb: Array):
    """(covered mask, packed r<<16|g<<8|b winner) → (r, g, b) u8 flat
    planes, black where uncovered. The ONE RGB888 winner decode — shared
    by the tiled dual render, the rig unpack, and the batched rig so the
    bit layout cannot drift between paths."""
    win = jnp.where(covered, mrgb, 0)
    rp = ((win >> 16) & 0xFF).astype(jnp.uint8)
    gp = ((win >> 8) & 0xFF).astype(jnp.uint8)
    bp = (win & 0xFF).astype(jnp.uint8)
    return rp, gp, bp


def unpack_packed_buffer(
    buf: Array, intrinsics: Intrinsics, z_near, z_far
) -> Tuple[Array, Array]:
    """Decode a (H·W,) packed (zq14|RGB666) min-buffer into image + zbuf."""
    h, w = intrinsics.height, intrinsics.width
    rp, gp, bp, zbuf = _decode_packed_planes(buf, z_near, z_far)
    img = jnp.stack([rp, gp, bp], -1).reshape(h, w, 3)
    return img, zbuf.reshape(h, w)


def project_zbuffer_packed_planar(
    x: Array,
    y: Array,
    z: Array,
    r: Array,
    g: Array,
    b: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
    z_near=0.25,
    z_far=4.5,
    return_planes: bool = False,
    rgb24: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Planar-input single-scatter packed render (see
    :func:`project_zbuffer_packed` for the precision envelope).

    r/g/b are uint8 planes matching x/y/z's shape. With
    ``return_planes=True`` the image comes back as three (H, W) uint8
    channel planes instead of (H, W, 3) — callers that filter the fused
    color should stay planar and stack once at the end (the HWC relayout
    costs real time on TPU). ``rgb24``: optional pre-packed color plane
    (Frameset.color_packed); when given, the RGB666 key bits derive from
    it (identical bits to the r/g/b path, which is then dead code).
    """
    w, h = intrinsics.width, intrinsics.height
    n_px = w * h
    z_bits = 14
    z_levels = jnp.float32((1 << z_bits) - 1)

    idx, zc, ok = compute_pixel_indices_planar(x, y, z, valid, intrinsics, mirror)
    z_near = jnp.asarray(z_near, jnp.float32)
    z_far = jnp.asarray(z_far, jnp.float32)
    # Clip to z_levels-1: zq=16383 with near-white RGB666 would make the
    # packed key equal the 0xFFFFFFFF uncovered sentinel and the point
    # would silently decode as uncovered/black.
    zq = jnp.clip(
        (zc - z_near) / (z_far - z_near) * z_levels, 0.0, z_levels - 1.0
    ).astype(jnp.uint32)
    if rgb24 is None:
        rgb666 = (
            ((r.astype(jnp.uint32) >> 2) << 12)
            | ((g.astype(jnp.uint32) >> 2) << 6)
            | (b.astype(jnp.uint32) >> 2)
        )
    else:
        # RGB666 from the canonical rgb24 plane (same bits as above).
        p24 = rgb24.astype(jnp.uint32)
        rgb666 = (
            (((p24 >> 18) & 0x3F) << 12)
            | (((p24 >> 10) & 0x3F) << 6)
            | ((p24 >> 2) & 0x3F)
        )
    key = (zq << 18) | rgb666
    key = jnp.where(ok, key, jnp.uint32(0xFFFFFFFF))

    buf = jnp.full((n_px + 1,), jnp.uint32(0xFFFFFFFF), jnp.uint32)
    buf = buf.at[idx.reshape(-1)].min(key.reshape(-1), mode="drop")
    buf = buf[:n_px]

    ro, go, bo, zbuf = _decode_packed_planes(buf, z_near, z_far)
    ro = ro.reshape(h, w)
    go = go.reshape(h, w)
    bo = bo.reshape(h, w)
    if return_planes:
        return (ro, go, bo), zbuf.reshape(h, w)
    return jnp.stack([ro, go, bo], -1), zbuf.reshape(h, w)


def _index_bits_for(n_pts: int) -> int:
    """Bits needed to address point indices 0..n_pts-1 while keeping the
    all-ones uint32 sentinel unreachable (index space of size n_pts+1)."""
    return max(1, n_pts.bit_length())


def indexed_winner_planar(
    x: Array,
    y: Array,
    z: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
    z_near=0.25,
    z_far=4.5,
) -> Tuple[Array, Array]:
    """Winner selection for the indexed render: ONE uint32 scatter-min of
    ``zq << idx_bits | point_index`` keys.

    Returns (covered (n_px,) bool, widx (n_px,) int32 winner point index,
    0 where uncovered). idx_bits is the smallest width covering all point
    indices (20 for the dual-848×480 hot path, leaving 12 depth bits →
    step (z_far-z_near)/4095 ≈ 0.92 mm at the default window). Ties within
    a depth bin resolve to the lowest point index (deterministic). The
    fidelity bound assumes points lie within [z_near, z_far]; out-of-range
    depths clip into the boundary bins.
    """
    w, h = intrinsics.width, intrinsics.height
    n_px = w * h
    n_pts = x.size
    idx_bits = _index_bits_for(n_pts)
    zq_bits = 32 - idx_bits
    if zq_bits < 8:
        raise ValueError(
            f"{n_pts} points leave only {zq_bits} depth bits; "
            "split the scatter per camera group"
        )
    z_levels = jnp.float32((1 << zq_bits) - 1)
    sentinel = jnp.uint32(0xFFFFFFFF)

    idx, zc, ok = compute_pixel_indices_planar(x, y, z, valid, intrinsics, mirror)
    z_near = jnp.asarray(z_near, jnp.float32)
    z_far = jnp.asarray(z_far, jnp.float32)
    zq = jnp.clip(
        (zc - z_near) / (z_far - z_near) * z_levels, 0.0, z_levels
    ).astype(jnp.uint32)
    # Integer re-clamp: for zq_bits >= 25 (clouds of <= 127 points) the f32
    # z_levels rounds UP to 2^zq_bits, so the float clip alone can emit a
    # value whose shift wraps the key and hands the pixel to the FARTHEST
    # point.
    zq = jnp.minimum(zq, jnp.uint32((1 << zq_bits) - 1))
    point_id = jnp.arange(n_pts, dtype=jnp.uint32).reshape(zq.shape)
    key = (zq << idx_bits) | point_id
    key = jnp.where(ok, key, sentinel)

    buf = jnp.full((n_px + 1,), sentinel, jnp.uint32)
    buf = buf.at[idx.reshape(-1)].min(key.reshape(-1), mode="drop")
    buf = buf[:n_px]

    covered = buf != sentinel
    widx = jnp.where(covered, buf & jnp.uint32((1 << idx_bits) - 1), 0).astype(
        jnp.int32
    )
    return covered, widx


def indexed_winner_gather(
    covered: Array,
    widx: Array,
    z: Array,
    r: Array,
    g: Array,
    b: Array,
    rgb24: Optional[Array] = None,
) -> Tuple[Array, Array, Array, Array]:
    """Recover the winners' exact RGB888 + exact f32 depth with ONE slice-2
    row gather from an (n_pts, 2) table of (packed RGB, z bit pattern).

    A single 2-wide row gather measures ≈ the cost of one element gather on
    v5e (~2.3 ms at 407k rows) while two separate gathers pay twice.
    Returns flat (r_u8, g_u8, b_u8, zbuf_f32) over the n_px pixels.
    """
    if rgb24 is None:
        packed_rgb = (
            (r.astype(jnp.uint32) << 16)
            | (g.astype(jnp.uint32) << 8)
            | b.astype(jnp.uint32)
        ).reshape(-1)
    else:
        # Pre-packed plane (Frameset.color_packed): skip the HWC relayout.
        packed_rgb = rgb24.astype(jnp.uint32).reshape(-1)
    z_bits = jax.lax.bitcast_convert_type(
        z.astype(jnp.float32), jnp.uint32
    ).reshape(-1)
    table = jnp.stack([packed_rgb, z_bits], axis=-1)
    rows = table[widx]  # (n_px, 2): one gather op
    win_rgb = jnp.where(covered, rows[:, 0], 0)
    zmax_bits = jax.lax.bitcast_convert_type(
        jnp.float32(jnp.finfo(jnp.float32).max), jnp.uint32
    )
    win_z = jnp.where(covered, rows[:, 1], zmax_bits)
    rp = (win_rgb >> 16).astype(jnp.uint8)
    gp = (win_rgb >> 8).astype(jnp.uint8)
    bp = win_rgb.astype(jnp.uint8)
    zbuf = jax.lax.bitcast_convert_type(win_z, jnp.float32)
    return rp, gp, bp, zbuf


def project_zbuffer_indexed_planar(
    x: Array,
    y: Array,
    z: Array,
    r: Array,
    g: Array,
    b: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
    z_near=0.25,
    z_far=4.5,
) -> Tuple[Array, Array]:
    """Single-scatter render with EXACT winner color + depth (≤1e-3 mode).

    One uint32 scatter-min selects, per target pixel, the point with
    minimal quantized depth (see :func:`indexed_winner_planar`); one slice-2
    row gather then reads that point's exact RGB888 and exact f32 depth.
    Replaces kernel_project_pointcloud + atomicMinFloat (kernels.cu:239-274)
    within a one-quantization-step winner-selection envelope — unlike the
    packed RGB666 mode, the *values* written are bit-exact fields of the
    selected point.
    """
    w, h = intrinsics.width, intrinsics.height
    covered, widx = indexed_winner_planar(
        x, y, z, valid, intrinsics, mirror, z_near, z_far
    )
    rp, gp, bp, zbuf = indexed_winner_gather(covered, widx, z, r, g, b)
    img = jnp.stack([rp, gp, bp], axis=-1).reshape(h, w, 3)
    return img, zbuf.reshape(h, w)


def project_zbuffer_indexed(
    points: Array,
    colors: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
    z_near: float = 0.25,
    z_far: float = 4.5,
) -> Tuple[Array, Array]:
    """(N, 3)-input convenience wrapper over the indexed planar render."""
    flat = points.reshape(-1, 3).astype(jnp.float32)
    col = colors.reshape(-1, 3)
    return project_zbuffer_indexed_planar(
        flat[:, 0], flat[:, 1], flat[:, 2],
        col[:, 0], col[:, 1], col[:, 2],
        valid.reshape(-1), intrinsics, mirror, z_near, z_far,
    )


def project_zbuffer_planar(
    x: Array,
    y: Array,
    z: Array,
    r: Array,
    g: Array,
    b: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
    rgb24: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Planar-input exact render (bit-identical winners to
    :func:`project_zbuffer`: min f32 depth, ties → min packed RGB).

    Implementation: lexicographic 3-key sort (pixel, z-bits, packed-color)
    followed by segment-start winner extraction and two scatters of the
    (unique) winners. On v5e this measures ~25% faster than the
    two-scatter + gather formulation (18.6 ms vs 24.7 ms at 814k points);
    z order again rides the order-preserving uint32 bitcast of positive
    floats.
    """
    w, h = intrinsics.width, intrinsics.height
    n_px = w * h
    sentinel = jnp.uint32(0xFFFFFFFF)
    invalid_packed = jnp.uint32(1 << 24)

    idx, zc, ok = compute_pixel_indices_planar(x, y, z, valid, intrinsics, mirror)
    idx = idx.reshape(-1)
    okf = ok.reshape(-1)
    z_bits = jax.lax.bitcast_convert_type(zc.astype(jnp.float32), jnp.uint32).reshape(-1)
    z_entry = jnp.where(okf, z_bits, sentinel)
    if rgb24 is None:
        packed = (
            (r.astype(jnp.uint32) << 16)
            | (g.astype(jnp.uint32) << 8)
            | b.astype(jnp.uint32)
        ).reshape(-1)
    else:  # pre-packed plane (Frameset.color_packed)
        packed = rgb24.astype(jnp.uint32).reshape(-1)

    sidx, sz, scol = jax.lax.sort((idx, z_entry, packed), num_keys=3)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), sidx[1:] != sidx[:-1]]
    )
    win = first & (sidx < n_px) & (sz != sentinel)
    tgt = jnp.where(win, sidx, n_px)

    zbuf_bits = jnp.full((n_px + 1,), sentinel, jnp.uint32)
    zbuf_bits = zbuf_bits.at[tgt].min(jnp.where(win, sz, sentinel), mode="drop")
    cbuf = jnp.full((n_px + 1,), invalid_packed, jnp.uint32)
    cbuf = cbuf.at[tgt].min(jnp.where(win, scol, invalid_packed), mode="drop")

    covered = cbuf[:n_px] < invalid_packed
    img = unpack_rgb(jnp.where(covered, cbuf[:n_px], 0).astype(jnp.int32)).reshape(
        h, w, 3
    )
    img = jnp.where(covered.reshape(h, w, 1), img, jnp.zeros_like(img))
    zmax = jnp.float32(jnp.finfo(jnp.float32).max)
    zb = zbuf_bits[:n_px]
    zbuf = jnp.where(
        zb == sentinel, zmax, jax.lax.bitcast_convert_type(zb, jnp.float32)
    )
    return img, zbuf.reshape(h, w)


def project_zbuffer_tiled_planar(
    x: Array,
    y: Array,
    z: Array,
    r: Array,
    g: Array,
    b: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
    return_planes: bool = False,
    interpret: bool = False,
    tile_px: int = 256,
    chunk: int = 1024,
    need_zbuf: bool = True,
    rgb24: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Scatter-free BIT-EXACT render: sort by pixel + Pallas tile resolve.

    Winner semantics identical to :func:`project_zbuffer` /
    :func:`project_zbuffer_planar` (min f32 depth, ties -> min packed RGB,
    exact RGB888 + exact f32 z-buffer), but the per-pixel minimization runs
    in a Pallas kernel over sort-contiguous entry slabs instead of an XLA
    scatter-min. On v5e the scatter is a serial ~8.6 ns/update loop (7.1 ms
    for the dual-camera 814k entries) while the 1-key sort is ~1.1 ms and
    the tile resolve is vector work — this is both the fastest and the most
    precise mode, and it scales to N-camera rigs with one sort instead of N
    scatters. See ops/pallas/zresolve_pallas.py for the kernel.
    Replaces kernel_project_pointcloud + atomicMinFloat
    (kernels.cu:118-126, :239-274) exactly.

    ``need_zbuf=False`` selects the image-only resolve
    (zresolve_winner_rgb: 3-key sort + first-of-run mask + single-pass
    kernel — about half the resolve's vector work) and returns ``None``
    for the z-buffer; the image is bit-identical to the full path. Use it
    when only the fused color topic is consumed (the reference publishes
    the fused image; its z-buffer is kernel-internal).

    ``rgb24``: optional pre-packed color, same leading shape as ``z``,
    int32 ``(r<<16)|(g<<8)|b`` (Frameset.color_packed). When given, ``r``/
    ``g``/``b`` are ignored (may be None) — skipping the per-frame HWC u8
    minor-dim relayout that channel-plane slicing costs on TPU.
    """
    from pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas import (
        invalid_pixel_id,
        zresolve_sorted_entries,
        zresolve_winner_rgb,
    )

    w, h = intrinsics.width, intrinsics.height
    n_px = w * h
    maxi = jnp.int32(0x7FFFFFFF)

    idx, zc, ok = compute_pixel_indices_planar(x, y, z, valid, intrinsics, mirror)
    okf = ok.reshape(-1)
    pix = jnp.where(
        okf, idx.reshape(-1), invalid_pixel_id(n_px, tile_px)
    ).astype(jnp.int32)
    zbits = jnp.where(
        okf,
        jax.lax.bitcast_convert_type(
            zc.astype(jnp.float32), jnp.int32
        ).reshape(-1),
        maxi,
    )
    if rgb24 is None:
        rgb24 = (
            (r.astype(jnp.int32) << 16)
            | (g.astype(jnp.int32) << 8)
            | b.astype(jnp.int32)
        )
    rgb = jnp.where(okf, rgb24.astype(jnp.int32).reshape(-1), maxi)

    if need_zbuf:
        minz, mrgb = zresolve_sorted_entries(
            pix, zbits, rgb, n_px, tile_px=tile_px, chunk=chunk,
            interpret=interpret,
        )
        covered = minz != maxi
        zbuf = jnp.where(
            covered,
            jax.lax.bitcast_convert_type(minz, jnp.float32),
            jnp.float32(jnp.finfo(jnp.float32).max),
        ).reshape(h, w)
    else:
        mrgb = zresolve_winner_rgb(
            pix, zbits, rgb, n_px, tile_px=tile_px, chunk=chunk,
            interpret=interpret,
        )
        covered = mrgb != maxi
        zbuf = None
    rp, gp, bp = decode_winner_planes(covered, mrgb)
    rp = rp.reshape(h, w)
    gp = gp.reshape(h, w)
    bp = bp.reshape(h, w)
    if return_planes:
        return (rp, gp, bp), zbuf
    return jnp.stack([rp, gp, bp], -1), zbuf


def pack_rgb(color_u8: Array) -> Array:
    """(..., 3) uint8 -> (...,) int32 key r<<16 | g<<8 | b."""
    c = color_u8.astype(jnp.int32)
    return (c[..., 0] << 16) | (c[..., 1] << 8) | c[..., 2]


def unpack_rgb(packed: Array) -> Array:
    """(...,) int32 -> (..., 3) uint8."""
    r = (packed >> 16) & 0xFF
    g = (packed >> 8) & 0xFF
    b = packed & 0xFF
    return jnp.stack([r, g, b], axis=-1).astype(jnp.uint8)


def project_zbuffer(
    points: Array,
    colors: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
    background: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Render a colored point cloud into an image with z-buffering.

    Args:
      points: (..., 3) float32 camera-frame points (any leading shape).
      colors: (..., 3) uint8 RGB per point.
      valid: (...,) bool.
      intrinsics: target (virtual) camera intrinsics; width/height give the
        output size.
      mirror: horizontal mirror (smart-mirror mode, kernels.cu:257-261).
      background: optional (H, W, 3) uint8 fill for uncovered pixels
        (reference uses black, kernels.cu:582).

    Returns:
      (image uint8 (H, W, 3), zbuf float32 (H, W) — FLT_MAX where empty,
      matching the reference's z-buffer preset, kernels.cu:584-587).

    TPU performance note: both scatter passes run on uint32 keys — integer
    scatter-min measured 3× faster than float scatter-min on v5e (2.9 ms vs
    8.3 ms for 814k updates). Positive IEEE-754 floats order-preserve under
    their unsigned bit patterns, so bitcasting z keeps EXACT f32 depth
    semantics (valid z is always > 0 here).
    """
    w, h = intrinsics.width, intrinsics.height
    n_px = w * h

    flat = points.reshape(-1, 3).astype(jnp.float32)
    col = colors.reshape(-1, 3)
    val = valid.reshape(-1)

    idx, z, ok = compute_pixel_indices(flat, val, intrinsics, mirror)
    sentinel = jnp.uint32(0xFFFFFFFF)
    z_bits = jax.lax.bitcast_convert_type(z, jnp.uint32)
    z_entry = jnp.where(ok, z_bits, sentinel)

    # Pass 1: depth winner per pixel (uint32-ordered == f32-ordered).
    zbuf_bits = jnp.full((n_px + 1,), sentinel, jnp.uint32)
    zbuf_bits = zbuf_bits.at[idx].min(z_entry, mode="drop")

    # Pass 2: color of the winning point; packed-RGB min is the
    # deterministic tie-break.
    zwin = zbuf_bits[idx]
    winner = ok & (z_entry <= zwin)
    invalid_packed = jnp.uint32(1 << 24)
    packed = jnp.where(winner, pack_rgb(col).astype(jnp.uint32), invalid_packed)
    cbuf = jnp.full((n_px + 1,), invalid_packed, jnp.uint32)
    cbuf = cbuf.at[idx].min(packed, mode="drop")

    covered = cbuf[:n_px] < invalid_packed
    img = unpack_rgb(jnp.where(covered, cbuf[:n_px], 0).astype(jnp.int32)).reshape(
        h, w, 3
    )
    if background is None:
        img = jnp.where(covered.reshape(h, w, 1), img, jnp.zeros_like(img))
    else:
        img = jnp.where(covered.reshape(h, w, 1), img, background)

    zmax = jnp.float32(jnp.finfo(jnp.float32).max)
    zb = zbuf_bits[:n_px]
    zbuf = jnp.where(
        zb == sentinel,
        zmax,
        jax.lax.bitcast_convert_type(zb, jnp.float32),
    )
    return img, zbuf.reshape(h, w)


def project_zbuffer_packed(
    points: Array,
    colors: Array,
    valid: Array,
    intrinsics: Intrinsics,
    mirror: bool = False,
    z_near: float = 0.25,
    z_far: float = 4.5,
) -> Tuple[Array, Array]:
    """Single-scatter variant: one uint32 scatter-min over a packed
    (14-bit quantized depth | RGB666) key.

    This is the TPU speed-of-light formulation: ONE integer scatter instead
    of two scatters + a gather — measured 10.6 ms vs 22 ms for the exact
    two-pass render on v5e at 814k points. Precision: depth steps of
    (z_far-z_near)/16384 (≈0.26 mm over the default D455 working range) and
    color quantized to 6 bits/channel (max error 2 LSB ≈ 0.8%) with exact
    reconstruction for the two top bits patterns; note the reference's own
    color writes race non-deterministically (kernels.cu:264-273), so LSB
    color noise is within its behavior envelope. Use project_zbuffer for
    bit-exact color.

    Returns (image uint8, zbuf f32 — dequantized; FLT_MAX where empty).
    """
    w, h = intrinsics.width, intrinsics.height
    n_px = w * h
    z_bits = 14
    z_levels = jnp.float32((1 << z_bits) - 1)

    flat = points.reshape(-1, 3)
    col = colors.reshape(-1, 3).astype(jnp.uint32)
    val = valid.reshape(-1)
    idx, z, ok = compute_pixel_indices(flat, val, intrinsics, mirror)

    z_near = jnp.asarray(z_near, jnp.float32)
    z_far = jnp.asarray(z_far, jnp.float32)
    # z_levels-1: see project_zbuffer_packed_planar (sentinel collision).
    zq = jnp.clip(
        (z - z_near) / (z_far - z_near) * z_levels, 0.0, z_levels - 1.0
    ).astype(jnp.uint32)
    rgb666 = (
        ((col[:, 0] >> 2) << 12) | ((col[:, 1] >> 2) << 6) | (col[:, 2] >> 2)
    )
    key = (zq << 18) | rgb666
    key = jnp.where(ok, key, jnp.uint32(0xFFFFFFFF))

    buf = jnp.full((n_px + 1,), jnp.uint32(0xFFFFFFFF), jnp.uint32)
    buf = buf.at[idx].min(key, mode="drop")
    buf = buf[:n_px]

    rp, gp, bp, zbuf = _decode_packed_planes(buf, z_near, z_far)
    img = jnp.stack([rp, gp, bp], -1).reshape(h, w, 3)
    return img, zbuf.reshape(h, w)
