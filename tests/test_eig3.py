"""Analytic 3×3 smallest-eigenvector vs numpy eigh."""

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.ops.voxel import (
    regularize_covariances,
    smallest_eigenvector_3x3,
)


def random_spd(rng, n):
    a = rng.normal(size=(n, 3, 3))
    return (a @ np.swapaxes(a, -1, -2)).astype(np.float32)


def test_smallest_eigenvector_matches_eigh(rng):
    covs = random_spd(rng, 200)
    got = np.asarray(smallest_eigenvector_3x3(jnp.asarray(covs)))
    for i in range(len(covs)):
        vals, vecs = np.linalg.eigh(covs[i].astype(np.float64))
        want = vecs[:, 0]
        dot = abs(float(got[i] @ want))
        # Allow looser alignment when eigenvalues are nearly degenerate.
        gap = (vals[1] - vals[0]) / max(vals[2], 1e-12)
        if gap > 1e-3:
            assert dot > 0.999, (i, dot, vals)


def test_plane_regularization_properties(rng):
    covs = random_spd(rng, 50)
    reg = np.asarray(regularize_covariances(jnp.asarray(covs), "plane", eps=1e-3))
    for i in range(len(covs)):
        vals = np.linalg.eigvalsh(reg[i].astype(np.float64))
        np.testing.assert_allclose(sorted(vals), [1e-3, 1.0, 1.0], atol=1e-4)
        # normal direction preserved: reg's small axis == cov's small axis
        _, vecs = np.linalg.eigh(covs[i].astype(np.float64))
        _, rvecs = np.linalg.eigh(reg[i].astype(np.float64))
        assert abs(vecs[:, 0] @ rvecs[:, 0]) > 0.99


def test_degenerate_covariances():
    covs = jnp.asarray(np.stack([np.zeros((3, 3)), np.eye(3)]), jnp.float32)
    n = np.asarray(smallest_eigenvector_3x3(covs))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)
    reg = np.asarray(regularize_covariances(covs, "plane"))
    assert np.isfinite(reg).all()
