"""Direct unit tests for the sorted-slab z-resolve kernels (interpret mode;
the on-chip behavior is gated by tpu_check.py)."""

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas import (
    invalid_pixel_id,
    zresolve_sorted_entries,
    zresolve_sorted_streams,
)


def _make_entries(rng, shape, n_px):
    pix = rng.integers(0, n_px, shape).astype(np.int32)
    invalid = rng.random(shape) < 0.2
    pix[invalid] = invalid_pixel_id(n_px)
    z = rng.integers(1, 1 << 30, shape).astype(np.int32)
    rgb = rng.integers(0, 1 << 24, shape).astype(np.int32)
    z[invalid] = 0x7FFFFFFF
    rgb[invalid] = 0x7FFFFFFF
    return pix, z, rgb


def _oracle(pix, z, rgb, n_px):
    """Scalar winner oracle: min z per pixel, ties -> min packed RGB."""
    maxi = np.int32(0x7FFFFFFF)
    minz = np.full(n_px, maxi, np.int32)
    mrgb = np.full(n_px, maxi, np.int32)
    for p, zz, rr in zip(pix.ravel(), z.ravel(), rgb.ravel()):
        if p >= n_px:
            continue
        if zz < minz[p] or (zz == minz[p] and rr < mrgb[p]):
            if zz < minz[p]:
                mrgb[p] = rr
            else:
                mrgb[p] = min(mrgb[p], rr)
            minz[p] = min(minz[p], zz)
    return minz, mrgb


def test_single_stream_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    n_px, n = 700, 4000
    pix, z, rgb = _make_entries(rng, (n,), n_px)
    want_z, want_r = _oracle(pix, z, rgb, n_px)
    got_z, got_r = zresolve_sorted_entries(
        jnp.asarray(pix), jnp.asarray(z), jnp.asarray(rgb), n_px,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_z), want_z)
    np.testing.assert_array_equal(np.asarray(got_r), want_r)


def test_streams_match_concatenated_single_stream():
    """S independently-sorted streams through the multi-stream kernel must
    be bit-identical to one resolve over the concatenated entries (the
    8-camera rig relies on this: per-camera sorts beat one big sort because
    lax.sort scales super-linearly on v5e)."""
    rng = np.random.default_rng(1)
    s, n, n_px = 5, 3000, 1500
    pix, z, rgb = _make_entries(rng, (s, n), n_px)
    a_z, a_r = zresolve_sorted_entries(
        jnp.asarray(pix.reshape(-1)), jnp.asarray(z.reshape(-1)),
        jnp.asarray(rgb.reshape(-1)), n_px, interpret=True,
    )
    b_z, b_r = zresolve_sorted_streams(
        jnp.asarray(pix), jnp.asarray(z), jnp.asarray(rgb), n_px,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a_z), np.asarray(b_z))
    np.testing.assert_array_equal(np.asarray(a_r), np.asarray(b_r))


def test_streams_depth_only_variant():
    rng = np.random.default_rng(2)
    s, n, n_px = 3, 2000, 900
    pix, z, _ = _make_entries(rng, (s, n), n_px)
    a_z, _ = zresolve_sorted_entries(
        jnp.asarray(pix.reshape(-1)), jnp.asarray(z.reshape(-1)), None,
        n_px, interpret=True,
    )
    b_z, _ = zresolve_sorted_streams(
        jnp.asarray(pix), jnp.asarray(z), None, n_px, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a_z), np.asarray(b_z))


def test_streams_empty_and_dense_tiles():
    """Degenerate slabs: one pixel takes most entries, many tiles empty."""
    rng = np.random.default_rng(3)
    s, n, n_px = 2, 4096, 2048
    pix = np.where(
        rng.random((s, n)) < 0.7, 37, rng.integers(0, n_px, (s, n))
    ).astype(np.int32)
    z = rng.integers(1, 1 << 30, (s, n)).astype(np.int32)
    rgb = rng.integers(0, 1 << 24, (s, n)).astype(np.int32)
    want_z, want_r = _oracle(pix, z, rgb, n_px)
    got_z, got_r = zresolve_sorted_streams(
        jnp.asarray(pix), jnp.asarray(z), jnp.asarray(rgb), n_px,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_z), want_z)
    np.testing.assert_array_equal(np.asarray(got_r), want_r)
