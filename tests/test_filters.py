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


def test_decimation_matches_oracle(rng):
    d = rng.integers(0, 3000, (24, 32)).astype(np.uint16)
    d[rng.random((24, 32)) < 0.3] = 0  # holes
    for m in (2, 4):
        got = np.asarray(F.decimation_filter(jnp.asarray(d), m))
        want = oracles.decimation_filter_oracle(d, m)
        np.testing.assert_array_equal(got, want)
        # host mirror identical
        from pointcloud_depthfusion_tpu.ops import host_filters as HF

        np.testing.assert_array_equal(HF.decimation_filter_np(d, m), want)


def test_decimate_intrinsics():
    from pointcloud_depthfusion_tpu.core.camera import Intrinsics

    intr = Intrinsics.create(848, 480, fx=631.0, fy=632.0, ppx=424.0, ppy=241.0)
    di = F.decimate_intrinsics(intr, 2)
    assert (di.width, di.height) == (424, 240)
    assert float(di.fx) == 315.5 and float(di.ppy) == 120.5


def test_spatial_filter_matches_oracle(rng):
    d = rng.integers(500, 3000, (14, 18)).astype(np.uint16)
    d[rng.random((14, 18)) < 0.15] = 0
    got = np.asarray(F.spatial_filter(jnp.asarray(d), 0.55, 20.0, 2))
    want = oracles.spatial_filter_oracle(d, 0.55, 20.0, 2)
    np.testing.assert_array_equal(got, want)
    from pointcloud_depthfusion_tpu.ops import host_filters as HF

    np.testing.assert_array_equal(HF.spatial_filter_np(d, 0.55, 20.0, 2), want)


def test_spatial_filter_holes_fill_matches_oracle(rng):
    """rs2 hole-persistence radii (holes_fill 1..5 → 2/4/8/16/unlimited px):
    XLA, numpy mirror, native C++ and the scalar oracle agree value-for-
    value; filled pixels inherit the nearest valid value to their left
    within the radius, longer hole runs stay 0 past it
    (realsense.cpp:245-247 configures the rs2 spatial filter whose option
    set includes these modes)."""
    from pointcloud_depthfusion_tpu.ops import host_filters as HF

    d = rng.integers(500, 3000, (12, 40)).astype(np.uint16)
    d[rng.random((12, 40)) < 0.3] = 0
    d[3, 5:30] = 0  # a long run: exceeds radius 2/4/8, inside 16/unlimited
    for mode in (1, 2, 3, 4, 5):
        want = oracles.spatial_filter_oracle(d, 0.55, 20.0, 2,
                                             holes_fill=mode)
        got = np.asarray(
            F.spatial_filter(jnp.asarray(d), 0.55, 20.0, 2, holes_fill=mode)
        )
        np.testing.assert_array_equal(got, want, err_msg=f"mode {mode}")
        np.testing.assert_array_equal(
            HF.spatial_filter_np(d, 0.55, 20.0, 2, holes_fill=mode), want,
            err_msg=f"host mode {mode}",
        )
        np.testing.assert_array_equal(
            HF._spatial_filter_numpy(d, 0.55, 20.0, 2, holes_fill=mode),
            want, err_msg=f"numpy mode {mode}",
        )
    # Semantics spot check, mode 1 (radius 2): the two holes nearest a
    # valid left value fill with it; the rest of a long run stays 0 after
    # the first iteration's left sweep (later sweeps may spread from the
    # right edge, so check against a single-iteration run).
    row = np.zeros((1, 10), np.uint16)
    row[0, 0] = 1000
    one = np.asarray(
        F.spatial_filter(jnp.asarray(row), 0.55, 20.0, 1, holes_fill=1)
    )
    np.testing.assert_array_equal(one[0, :4], [1000, 1000, 1000, 0])
    assert not one[0, 3:].any()
    # Invalid mode rejected.
    import pytest

    with pytest.raises(ValueError):
        F.spatial_filter(jnp.asarray(row), holes_fill=6)


def test_spatial_filter_float_disparity_domain(rng):
    disp = (rng.random((10, 12)).astype(np.float32) * 50 + 10).astype(np.float32)
    disp[rng.random((10, 12)) < 0.2] = 0.0
    got = np.asarray(F.spatial_filter(jnp.asarray(disp), 0.5, 8.0, 1))
    want = oracles.spatial_filter_oracle(disp, 0.5, 8.0, 1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)


def test_disparity_round_trip(rng):
    d = rng.integers(300, 6000, (20, 24)).astype(np.uint16)
    d[rng.random((20, 24)) < 0.1] = 0
    disp = F.depth_to_disparity(jnp.asarray(d), 0.001, 631.0, 0.095)
    back = np.asarray(F.disparity_to_depth(disp, 0.001, 631.0, 0.095))
    assert np.abs(back.astype(int) - d.astype(int)).max() <= 1
    np.testing.assert_array_equal(back == 0, d == 0)
    from pointcloud_depthfusion_tpu.ops import host_filters as HF

    disp_np = HF.depth_to_disparity_np(d, 0.001, 631.0, 0.095)
    np.testing.assert_allclose(np.asarray(disp), disp_np, rtol=1e-6)


def test_spatial_filter_small_depths_tie_rounding(rng):
    """Raw depths <= 20 exercise exact-.5 blend ties where an f64 oracle
    rounds differently from the f32 implementations (e.g. 0.55*1+0.45*11
    = 5.5 in f32 -> 6, but 5.4999999999999996 in f64 -> 5)."""
    from pointcloud_depthfusion_tpu.ops import host_filters as HF

    d = rng.integers(0, 25, (16, 20)).astype(np.uint16)
    d[0, :2] = [11, 1]  # the reproduced tie pair
    want = oracles.spatial_filter_oracle(d, 0.55, 20.0, 2)
    np.testing.assert_array_equal(
        np.asarray(F.spatial_filter(jnp.asarray(d), 0.55, 20.0, 2)), want
    )
    np.testing.assert_array_equal(HF.spatial_filter_np(d, 0.55, 20.0, 2), want)
