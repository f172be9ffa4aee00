"""Filter-op tests against the scalar numpy oracles."""

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.ops import filters as F

import oracles


def test_minmax_matches_oracle(rng):
    d = rng.integers(0, 5000, (24, 32)).astype(np.uint16)
    got = F.filter_depth_minmax(jnp.asarray(d), 0.001, 0.5, 3.0)
    want = oracles.minmax_filter_oracle(d, 0.001, 0.5, 3.0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_roi_mask_clamping():
    m = np.asarray(F.roi_mask(10, 12, [3, 2, 5, 4]))
    assert m.sum() == 20 and m[2, 3] and not m[1, 3] and not m[2, 2]
    # Negative / oversize boxes → full image (kernels.cu:379-384)
    assert np.asarray(F.roi_mask(10, 12, [-1, -1, -1, -1])).all()
    # Oversize width falls back to full width (clipped at the image edge);
    # height stays clamped to 5 rows.
    m2 = np.asarray(F.roi_mask(10, 12, [4, 0, 100, 5]))
    assert m2[:5, 4:].all() and not m2[5:].any() and not m2[:, :4].any()


def test_validity_mask_and_count(rng):
    d = rng.integers(0, 3, (16, 16)).astype(np.uint16)
    valid = F.depth_validity_mask(jnp.asarray(d), roi=[2, 2, 10, 10])
    want = (d > 0) & np.asarray(F.roi_mask(16, 16, [2, 2, 10, 10]))
    np.testing.assert_array_equal(np.asarray(valid), want)
    assert int(F.mask_count(valid)) == int(want.sum())


def test_morphology_matches_oracle(rng):
    mask = rng.random((20, 24)) > 0.4
    np.testing.assert_array_equal(np.asarray(F.erode(jnp.asarray(mask))), oracles.erode_oracle(mask))
    np.testing.assert_array_equal(np.asarray(F.dilate(jnp.asarray(mask))), oracles.dilate_oracle(mask))
    np.testing.assert_array_equal(np.asarray(F.morph_open(jnp.asarray(mask))), oracles.morph_open_oracle(mask))
    np.testing.assert_array_equal(np.asarray(F.morph_close(jnp.asarray(mask))), oracles.morph_close_oracle(mask))


def test_median_color_matches_oracle(rng):
    img = rng.integers(0, 256, (12, 14, 3)).astype(np.uint8)
    got = np.asarray(F.median_filter(jnp.asarray(img)))
    want = oracles.median3x3_oracle(img)
    np.testing.assert_array_equal(got, want)
    # border untouched
    np.testing.assert_array_equal(got[0], img[0])
    np.testing.assert_array_equal(got[:, -1], img[:, -1])


def test_gauss_color_matches_oracle(rng):
    img = rng.integers(0, 256, (12, 14, 3)).astype(np.uint8)
    got = np.asarray(F.gauss_filter(jnp.asarray(img), 3))
    want = oracles.gauss3x3_oracle(img)
    # float rounding at .5 boundaries can differ by 1 LSB
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    np.testing.assert_array_equal(got[0], img[0])


def test_gauss_depth_u16(rng):
    d = rng.integers(0, 3000, (16, 16)).astype(np.uint16)
    out = np.asarray(F.gauss_filter(jnp.asarray(d), 5))
    assert out.dtype == np.uint16 and out.shape == d.shape
    np.testing.assert_array_equal(out[:2], d[:2])  # border (radius 2)


def test_temporal_filter_matches_oracle(rng):
    cur = rng.integers(0, 1000, (10, 12)).astype(np.uint16)
    prev = (cur.astype(np.int32) + rng.integers(-30, 30, cur.shape)).clip(0, 65535).astype(np.uint16)
    cur[0, 0] = 0
    prev[0, 1] = 0
    got, hist = F.temporal_filter(jnp.asarray(cur), jnp.asarray(prev))
    want = oracles.temporal_filter_oracle(cur, prev)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(hist), want)


def test_filter_depth_composed(rng):
    d = rng.integers(0, 5000, (24, 32)).astype(np.uint16)
    fd, valid = F.filter_depth(jnp.asarray(d), 0.001, 0.5, 3.0, roi=[4, 4, 20, 16])
    fd = np.asarray(fd)
    valid = np.asarray(valid)
    assert ((fd > 0) == valid).all()
    inside = oracles.minmax_filter_oracle(d, 0.001, 0.5, 3.0)
    roi = np.asarray(F.roi_mask(24, 32, [4, 4, 20, 16]))
    np.testing.assert_array_equal(fd, np.where(roi, inside, 0))


def test_bilateral_smoke(rng):
    d = rng.integers(500, 3000, (16, 16)).astype(np.uint16)
    out = np.asarray(F.bilateral_filter_depth(jnp.asarray(d), radius=2))
    assert out.shape == d.shape and out.dtype == np.uint16
    # smoothing should not move values outside the input range
    assert out.min() >= d.min() - 1 and out.max() <= d.max() + 1


def test_hole_fill_modes(rng):
    d = rng.integers(500, 3000, (10, 12)).astype(np.uint16)
    d[3, 4] = 0
    d[0, 0] = 0
    # left fill
    got = np.asarray(F.hole_fill(jnp.asarray(d), "left"))
    assert got[3, 4] == d[3, 3]
    assert got[0, 0] == 0  # no valid pixel to the left
    # farthest: max of 3x3 neighborhood
    got_f = np.asarray(F.hole_fill(jnp.asarray(d), "farthest"))
    assert got_f[3, 4] == d[2:5, 3:6].max()
    # nearest: min positive of 3x3 neighborhood
    got_n = np.asarray(F.hole_fill(jnp.asarray(d), "nearest"))
    nb = d[2:5, 3:6].astype(int)
    assert got_n[3, 4] == nb[nb > 0].min()
    # valid pixels untouched in all modes
    keep = d > 0
    for g in (got, got_f, got_n):
        np.testing.assert_array_equal(g[keep], d[keep])
