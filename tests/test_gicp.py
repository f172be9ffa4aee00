"""VGICP solver tests: golden bunny-like pair + frame-pair registration.

The reference validates its solver on a Stanford-bunny pair with a known
15°-about-Y + 0.5 m-in-X offset (registration_node.cpp:285-295, filename
encodes the answer). We reproduce that exact protocol on a synthetic
structured cloud.
"""

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.core import geometry as G
from pointcloud_depthfusion_tpu.registration.gicp import (
    GICPConfig,
    default_multiscale_configs,
    gicp_register,
    gicp_register_multiscale,
)

import oracles


def apply(t, pts):
    return pts @ t[:3, :3].T + t[:3, 3]


def known_transform(angle_y_deg=15.0, tx=0.5):
    a = np.deg2rad(angle_y_deg)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
    t[0, 3] = tx
    return t


def test_bunny_pair_golden():
    target = oracles.make_bunny_like_cloud(4000)
    t_true = known_transform(15.0, 0.5)
    # source = target moved by t_true ⇒ solver must recover inv(t_true)
    source = apply(t_true, target).astype(np.float32)

    # Half-meter cold start needs the coarse-to-fine ladder, exactly like
    # the reference's adjust_resolution schedule.
    cfgs = default_multiscale_configs(
        resolution=0.05, voxel_size=0.02, coarse_start=0.4, steps=4,
        max_iterations=32, kernel_width=0.0,
    )
    res = gicp_register_multiscale(
        jnp.asarray(source), jnp.ones(len(source), bool),
        jnp.asarray(target), jnp.ones(len(target), bool),
        jnp.eye(4, dtype=jnp.float32), cfgs,
    )
    got = np.asarray(res.transform)
    want = np.linalg.inv(t_true)
    # rotation error (deg) and translation error (m)
    dr = got[:3, :3] @ want[:3, :3].T
    ang = np.rad2deg(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
    terr = np.linalg.norm(got[:3, 3] - want[:3, 3])
    assert ang < 0.6, (ang, terr)
    assert terr < 0.01, (ang, terr)
    assert float(res.fitness) < 1e-3


def test_warm_start_converges_faster():
    target = oracles.make_bunny_like_cloud(3000)
    t_true = known_transform(10.0, 0.3)
    source = apply(t_true, target).astype(np.float32)
    config = GICPConfig.create(resolution=0.1, voxel_size=0.02, max_iterations=40,
                               kernel_width=0.0)
    cold = gicp_register(
        jnp.asarray(source), jnp.ones(len(source), bool),
        jnp.asarray(target), jnp.ones(len(target), bool),
        jnp.eye(4, dtype=jnp.float32), config,
    )
    warm = gicp_register(
        jnp.asarray(source), jnp.ones(len(source), bool),
        jnp.asarray(target), jnp.ones(len(target), bool),
        jnp.asarray(np.linalg.inv(t_true)), config,
    )
    want = np.linalg.inv(t_true)
    warm_err = np.linalg.norm(np.asarray(warm.transform)[:3, 3] - want[:3, 3])
    cold_err = np.linalg.norm(np.asarray(cold.transform)[:3, 3] - want[:3, 3])
    # The warm start must at least not end up worse than the cold start,
    # AND must actually use the guess: strictly fewer iterations.
    assert warm_err <= cold_err + 5e-3, (warm_err, cold_err)
    assert warm_err < 0.02, warm_err
    assert int(warm.iterations) < int(cold.iterations), (
        int(warm.iterations), int(cold.iterations))


def test_identity_registration_stays_near_identity():
    # VGICP's identity is not an exact stationary point (the rotational
    # gradient of the voxel-mean residuals is nonzero at finite resolution),
    # so allow drift of O(resolution/10) like the reference solver exhibits.
    target = oracles.make_bunny_like_cloud(2000)
    config = GICPConfig.create(resolution=0.05, voxel_size=0.01, max_iterations=20,
                               kernel_width=0.0)
    res = gicp_register(
        jnp.asarray(target), jnp.ones(len(target), bool),
        jnp.asarray(target), jnp.ones(len(target), bool),
        jnp.eye(4, dtype=jnp.float32), config,
    )
    got = np.asarray(res.transform)
    ang = np.rad2deg(np.arccos(np.clip((np.trace(got[:3, :3]) - 1) / 2, -1, 1)))
    assert ang < 1.0, ang
    assert np.linalg.norm(got[:3, 3]) < 0.01
    assert bool(res.converged)


def test_masked_points_ignored(rng):
    target = oracles.make_bunny_like_cloud(2000)
    t_true = known_transform(8.0, 0.2)
    source = apply(t_true, target).astype(np.float32)
    # poison half the source array, mark invalid
    junk = rng.uniform(-50, 50, source.shape).astype(np.float32)
    source_all = np.concatenate([source, junk])
    valid = np.concatenate([np.ones(len(source), bool), np.zeros(len(junk), bool)])
    cfgs = default_multiscale_configs(
        resolution=0.05, voxel_size=0.02, coarse_start=0.3, steps=3,
        max_iterations=32, kernel_width=0.0,
    )
    res = gicp_register_multiscale(
        jnp.asarray(source_all), jnp.asarray(valid),
        jnp.asarray(target), jnp.ones(len(target), bool),
        jnp.eye(4, dtype=jnp.float32), cfgs,
    )
    got = np.asarray(res.transform)
    want = np.linalg.inv(t_true)
    assert np.linalg.norm(got[:3, 3] - want[:3, 3]) < 0.02


def test_planar_solver_matches_matrix(rng):
    """The plane-form Gauss-Newton loop must reproduce the batched-tensor
    loop (same math, different f32 association order)."""
    import dataclasses

    from pointcloud_depthfusion_tpu.registration.gicp import (
        GICPConfig,
        gicp_register,
    )

    tgt = oracles.make_bunny_like_cloud(3000)
    t_true = known_transform(4.0, 0.05)
    src = apply(t_true, tgt).astype(np.float32)
    v_s = jnp.ones(src.shape[0], bool)
    v_t = jnp.ones(tgt.shape[0], bool)
    cfg_p = GICPConfig.create(
        resolution=0.1, voxel_size=0.05, max_iterations=12, solver="planar",
        kernel_width=0.0,
    )
    cfg_m = dataclasses.replace(cfg_p, solver="matrix")
    guess = jnp.eye(4, dtype=jnp.float32)
    rp = gicp_register(jnp.asarray(src), v_s, jnp.asarray(tgt), v_t, guess, cfg_p)
    rm = gicp_register(jnp.asarray(src), v_s, jnp.asarray(tgt), v_t, guess, cfg_m)
    np.testing.assert_allclose(
        np.asarray(rp.transform), np.asarray(rm.transform), atol=2e-4
    )
    assert abs(int(rp.iterations) - int(rm.iterations)) <= 1
    assert abs(float(rp.fitness) - float(rm.fitness)) <= 1e-6 + 0.05 * float(
        rm.fitness
    )


def test_neighbor_search_direct1_equals_direct7_on_isolated_voxels():
    """When every source point sits INSIDE an occupied voxel whose 26
    neighbors are all empty (sparse lattice, identity pose, one GN step),
    every neighbor lookup misses and direct7/direct27 accumulate exactly
    the direct1 terms — the step is bit-identical. (With any pose offset
    the modes legitimately differ: a point in an empty cell next to an
    occupied voxel corresponds under direct7 but not direct1 — that IS the
    basin widening, covered by test_direct27_widens_convergence_basin.)"""
    rng = np.random.default_rng(5)
    # voxel centers on a lattice 3 voxels apart + jitter << resolution
    base = rng.integers(0, 6, size=(500, 3)).astype(np.float32) * 0.3 + 0.05
    base += rng.normal(0, 0.008, base.shape).astype(np.float32)
    target = np.unique(base, axis=0)
    source = target.copy()

    results = {}
    for ns in ("direct1", "direct7", "direct27"):
        # table_size 2^17: hash collisions in voxel_downsample average
        # DISTANT points into phantom centroids between lattice sites,
        # which land in cells adjacent to occupied voxels and would give
        # direct7 legitimate extra correspondences (verified: 21 phantoms
        # at 2^12, 0 at 2^17 for this seed).
        cfg = GICPConfig.create(
            resolution=0.1, voxel_size=0.02, kernel_width=0.0,
            kernel_max_dist=-1.0, max_iterations=1, table_size=1 << 17,
            neighbor_search=ns,
        )
        results[ns] = gicp_register(
            jnp.asarray(source), jnp.ones(len(source), bool),
            jnp.asarray(target), jnp.ones(len(target), bool),
            jnp.eye(4, dtype=jnp.float32), cfg,
        )
    assert int(results["direct1"].num_correspondences) > 100
    for ns in ("direct7", "direct27"):
        np.testing.assert_array_equal(
            np.asarray(results[ns].transform),
            np.asarray(results["direct1"].transform),
        )
        assert int(results[ns].num_correspondences) == int(
            results["direct1"].num_correspondences
        )


def test_direct27_widens_convergence_basin():
    """fast_gicp multi-voxel correspondence (registration.cpp:31): a
    16°/20 cm cold start WITHOUT annealing — 2× the direct1 basin
    (~8°/10 cm at resolution 0.05) — diverges under direct1 but converges
    under direct27 (measured: converges from 16°/0.20, diverges at
    20°/0.25)."""
    target = oracles.make_bunny_like_cloud(3000)
    t_true = known_transform(16.0, 0.20)
    source = apply(t_true, target).astype(np.float32)
    want = np.linalg.inv(t_true)

    def solve(ns):
        cfg = GICPConfig.create(
            resolution=0.05, voxel_size=0.02, kernel_width=0.0,
            kernel_max_dist=-1.0, max_iterations=64, table_size=1 << 13,
            neighbor_search=ns,
        )
        res = gicp_register(
            jnp.asarray(source), jnp.ones(len(source), bool),
            jnp.asarray(target), jnp.ones(len(target), bool),
            jnp.eye(4, dtype=jnp.float32), cfg,
        )
        got = np.asarray(res.transform)
        dr = got[:3, :3] @ want[:3, :3].T
        ang = np.rad2deg(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
        return ang, np.linalg.norm(got[:3, 3] - want[:3, 3])

    ang1, terr1 = solve("direct1")
    ang27, terr27 = solve("direct27")
    assert terr1 > 0.05, (ang1, terr1)  # direct1 diverges from here
    assert ang27 < 1.5 and terr27 < 0.02, (ang27, terr27)


def test_neighbor_search_validation():
    import pytest as _pytest

    target = oracles.make_bunny_like_cloud(500)
    src = jnp.asarray(target)
    ones = jnp.ones(len(target), bool)
    bad = GICPConfig.create(neighbor_search="direct5", table_size=1 << 10)
    with _pytest.raises(ValueError, match="neighbor_search"):
        gicp_register(src, ones, src, ones, jnp.eye(4, dtype=jnp.float32), bad)
    matrix27 = GICPConfig.create(neighbor_search="direct27", solver="matrix",
                                 table_size=1 << 10)
    with _pytest.raises(ValueError, match="planar"):
        gicp_register(src, ones, src, ones, jnp.eye(4, dtype=jnp.float32),
                      matrix27)


def test_no_correspondences_reports_unconverged():
    """A solve whose transformed source lands entirely outside the target
    (zero correspondences) must exit quickly but report converged=False —
    the zeroed Gauss-Newton step previously satisfied the step-norm
    epsilons and stamped a FAILED solve as converged."""
    rng = np.random.default_rng(0)
    tgt = rng.uniform(0.0, 1.0, (500, 3)).astype(np.float32)
    src = tgt + np.float32(100.0)  # far outside every target voxel
    cfg = GICPConfig.create(
        resolution=0.05, voxel_size=0.02, max_iterations=8,
        table_size=1 << 10,
    )
    valid = jnp.ones((500,), bool)
    res = gicp_register(
        jnp.asarray(src), valid, jnp.asarray(tgt), valid,
        jnp.eye(4, dtype=jnp.float32), cfg,
    )
    assert int(res.num_correspondences) == 0
    assert not bool(res.converged)
    assert float(res.fitness) > 1e10  # the failure sentinel
    # exits immediately (zero step cannot improve), not at the cap
    assert int(res.iterations) <= 2, int(res.iterations)
    # the transform is left at the initial guess, not corrupted
    np.testing.assert_allclose(np.asarray(res.transform), np.eye(4), atol=1e-6)
