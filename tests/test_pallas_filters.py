"""Pallas filter kernels vs the jnp reference ops (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pointcloud_depthfusion_tpu.ops import filters as F
from pointcloud_depthfusion_tpu.ops.pallas import filters_pallas as FP


def test_median3x3_pallas_matches(rng):
    img = rng.integers(0, 256, (24, 128)).astype(np.uint8)
    got = np.asarray(FP.median3x3_plane(jnp.asarray(img), interpret=True))
    want = np.asarray(F.median_filter(jnp.asarray(img), 1))
    np.testing.assert_array_equal(got, want)


def test_gauss3x3_pallas_matches(rng):
    img = rng.integers(0, 256, (24, 128)).astype(np.uint8)
    got = np.asarray(FP.gauss3x3_plane(jnp.asarray(img), interpret=True))
    want = np.asarray(F.gauss_filter(jnp.asarray(img), 3))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_filter_color_pallas_matches(rng):
    img = rng.integers(0, 256, (16, 128, 3)).astype(np.uint8)
    got = np.asarray(FP.filter_color_pallas(jnp.asarray(img), True, interpret=True))
    want = np.asarray(F.filter_color(jnp.asarray(img), True))
    np.testing.assert_array_equal(got, want)


def test_morph_pallas_matches(rng):
    mask = (rng.random((24, 128)) > 0.4).astype(np.uint8)
    got_e = np.asarray(FP.morph_plane(jnp.asarray(mask), dilate=False, interpret=True))
    want_e = np.asarray(F.erode(jnp.asarray(mask > 0))).astype(np.uint8)
    np.testing.assert_array_equal(got_e, want_e)
    got_d = np.asarray(FP.morph_plane(jnp.asarray(mask), dilate=True, interpret=True))
    want_d = np.asarray(F.dilate(jnp.asarray(mask > 0))).astype(np.uint8)
    np.testing.assert_array_equal(got_d, want_d)
