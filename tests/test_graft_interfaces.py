"""Driver-interface regression tests: entry() and dryrun_multichip must
always compile and run, and entry()'s EXACT program must reproduce the
scalar oracle — the same check the fusion tests make, applied to the
program the driver actually compiles."""

import jax
import jax.numpy as jnp
import numpy as np

import oracles


def test_entry_matches_scalar_oracle():
    """entry()'s full driver-shape program (848×480 dual fuse, tiled render,
    vertical+mirror, Gauss color filter) against the scalar z-buffer oracle
    (kernels.cu:239-274 semantics with the deterministic tie-break).

    The oracle projects in f64 and the device in f32, so winners can flip
    at rounding near-ties; thresholds below allow a small flip budget like
    test_fusion_oracle does (flips then smear through the 3×3 Gauss)."""
    import __graft_entry__ as g
    from pointcloud_depthfusion_tpu.core.camera import fused_virtual_intrinsics
    from pointcloud_depthfusion_tpu.fusion.pipeline import fused_camera_transform

    fn, (left, right, t_rl, config) = g.entry()
    got = np.asarray(jax.jit(fn)(left, right, t_rl, config))
    assert got.shape == (848, 480, 3) and got.dtype == np.uint8
    assert (got.sum(-1) > 0).mean() > 0.3

    intr = left.color_intrinsics
    fused_intr = fused_virtual_intrinsics(intr, config.vertical_image)
    fused_t = np.asarray(
        fused_camera_transform(config, jnp.asarray(t_rl)), np.float64
    )
    min_d, max_d = float(config.min_depth), float(config.max_depth)

    def prep(fs, transform):
        """Vectorized deproject (f64 like the scalar oracle, cast f32 at
        the transform like the device path)."""
        depth = np.asarray(fs.depth)
        d = oracles.minmax_filter_oracle(depth, 0.001, min_d, max_d)
        h, w = d.shape
        us, vs = np.meshgrid(np.arange(w, dtype=np.float64),
                             np.arange(h, dtype=np.float64))
        z = d.astype(np.float64) * 0.001
        x = (us - float(intr.ppx)) / float(intr.fx) * z
        y = (vs - float(intr.ppy)) / float(intr.fy) * z
        pts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
        r = transform[:3, :3].astype(np.float32)
        t = transform[:3, 3].astype(np.float32)
        pts = (pts @ r.T + t).astype(np.float32)
        return pts, (d > 0).reshape(-1)

    t_total_r = (fused_t @ np.asarray(t_rl, np.float64)).astype(np.float64)
    pts_l, val_l = prep(left, fused_t)
    pts_r, val_r = prep(right, t_total_r)
    pts = np.concatenate([pts_l, pts_r])
    cols = np.concatenate(
        [np.asarray(left.color).reshape(-1, 3),
         np.asarray(right.color).reshape(-1, 3)]
    )
    val = np.concatenate([val_l, val_r])
    want, want_z = oracles.project_zbuffer_oracle(
        pts, cols, val,
        float(fused_intr.fx), float(fused_intr.fy),
        float(fused_intr.ppx), float(fused_intr.ppy),
        fused_intr.width, fused_intr.height, mirror=config.mirror_image,
    )
    assert config.filter_fused_color and not config.use_median_filter
    want = oracles.gauss3x3_oracle(want)

    same = (got == want).all(axis=-1)
    assert same.mean() > 0.98, f"bit-equal fraction {same.mean():.4f}"
    # The differing pixels must be rounding-flip neighborhoods, not wrong
    # math: bounded channel error except a tiny far tail.
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32)).max(axis=-1)
    assert (diff > 64).mean() < 2e-3, (diff > 64).mean()


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(4)


def test_dryrun_multichip_fails_on_broken_solver(monkeypatch):
    """The dryrun asserts QUALITY, not just shapes: a wrecked GN solver
    (damping 1e6 freezes the update, so the sharded solve never leaves the
    identity guess) must raise — the driver then records a non-zero exit
    instead of `ok: true` for a numerically-broken multichip path. Same
    executable as the healthy run above (damping is a traced leaf), so
    this costs no extra compiles."""
    import pytest

    import __graft_entry__ as g

    monkeypatch.setenv("PDF_DRYRUN_BREAK_SOLVER", "1")
    with pytest.raises(AssertionError, match="fitness|corr|rotation"):
        g.dryrun_multichip(4)
