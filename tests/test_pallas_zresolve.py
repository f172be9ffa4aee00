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


def test_exact_chunk_spans_match_searchsorted():
    """The two-level span computation is exactly jnp.searchsorted."""
    from pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas import (
        _exact_chunk_spans,
    )

    rng = np.random.default_rng(0)
    tile_px, chunk = 64, 128
    for trial in range(5):
        n_tiles = int(rng.integers(3, 12))
        n = int(rng.integers(1, 8)) * chunk
        # sorted pixel ids incl. duplicates, boundary-exact values, and
        # invalid-id tail
        sp = np.sort(rng.integers(0, n_tiles * tile_px + 5, size=n))
        sp[-chunk // 2:] = 0x40000000  # invalid tail
        sp = np.sort(sp).astype(np.int32)
        cs, ce = _exact_chunk_spans(jnp.asarray(sp), n_tiles, tile_px, chunk)
        bounds = np.arange(n_tiles + 1, dtype=np.int64) * tile_px
        starts = np.searchsorted(sp, bounds).astype(np.int32)
        np.testing.assert_array_equal(np.asarray(cs), starts[:-1] // chunk)
        np.testing.assert_array_equal(
            np.asarray(ce), (starts[1:] + chunk - 1) // chunk
        )


def test_exact_chunk_spans_searchsorted_fallback_branch():
    """Past the compare budget (composed batched-rig pixel spaces, where
    the broadcast feed goes quadratic) the spans fall back to searchsorted;
    both branches must agree on identical inputs."""
    from pointcloud_depthfusion_tpu.ops.pallas import zresolve_pallas as Z

    rng = np.random.default_rng(3)
    tile_px, chunk = 64, 128
    n_tiles, n = 10, 8 * 128
    sp = np.sort(rng.integers(0, n_tiles * tile_px, size=n)).astype(np.int32)
    fast = Z._exact_chunk_spans(jnp.asarray(sp), n_tiles, tile_px, chunk)
    orig = Z._SPAN_COMPARE_BUDGET
    try:
        Z._SPAN_COMPARE_BUDGET = 1  # force the fallback branch
        slow = Z._exact_chunk_spans(jnp.asarray(sp), n_tiles, tile_px, chunk)
    finally:
        Z._SPAN_COMPARE_BUDGET = orig
    np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(slow[0]))
    np.testing.assert_array_equal(np.asarray(fast[1]), np.asarray(slow[1]))


def test_winner_rgb_matches_full_resolve():
    """Image-only resolve (3-key sort + first-of-run mask + one-pass
    kernel) returns exactly the full resolve's winner RGB, including
    coverage (sentinel where no entry landed) and min-RGB tie-breaks."""
    from pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas import (
        invalid_pixel_id,
        zresolve_sorted_entries,
        zresolve_winner_rgb,
    )

    rng = np.random.default_rng(7)
    n_px = 1000
    n = 4096
    pix = rng.integers(0, n_px, size=n).astype(np.int32)
    pix[rng.random(n) < 0.1] = invalid_pixel_id(n_px)
    # force z ties (small value range) to exercise the min-RGB tie-break
    zbits = rng.integers(1, 50, size=n).astype(np.int32)
    rgb = rng.integers(0, 1 << 24, size=n).astype(np.int32)
    args = (jnp.asarray(pix), jnp.asarray(zbits), jnp.asarray(rgb), n_px)
    minz, mrgb = zresolve_sorted_entries(*args, tile_px=64, chunk=256,
                                         interpret=True)
    got = zresolve_winner_rgb(*args, tile_px=64, chunk=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(mrgb))
    # coverage must be derivable from the rgb sentinel alone
    np.testing.assert_array_equal(
        np.asarray(got) != 0x7FFFFFFF, np.asarray(minz) != 0x7FFFFFFF
    )


def test_fuse_emit_zbuf_false_bit_identical_image():
    """fuse(emit_zbuf=False) produces the identical image and zbuf=None."""
    import dataclasses

    from pointcloud_depthfusion_tpu.core.camera import (
        Intrinsics,
        fused_virtual_intrinsics,
    )
    from pointcloud_depthfusion_tpu.core.frameset import Frameset
    from pointcloud_depthfusion_tpu.fusion.pipeline import (
        FusionConfig,
        fuse,
    )
    from pointcloud_depthfusion_tpu.io.synthetic import (
        SyntheticScene,
        right_to_left_transform,
        two_camera_rig,
    )

    intr = Intrinsics.create(106, 60, fx=80.0, fy=80.0, ppx=53.0, ppy=30.0)
    scene = SyntheticScene()
    wl, wr = two_camera_rig(baseline=0.5, toe_in_deg=8.0)
    fs_l = scene.render(intr, wl)
    fs_r = scene.render(intr, wr)
    left = Frameset.create(fs_l.depth, fs_l.color, intr,
                           depth_scale=fs_l.depth_scale)
    right = Frameset.create(fs_r.depth, fs_r.color, intr,
                            depth_scale=fs_r.depth_scale)
    t_rl = right_to_left_transform(wl, wr).astype(jnp.float32)

    cfg = FusionConfig.create(render_mode="tiled")
    fi = fused_virtual_intrinsics(intr, cfg.vertical_image)
    full = fuse(left, right, t_rl, cfg, fi)
    fast = fuse(left, right, t_rl,
                dataclasses.replace(cfg, emit_zbuf=False), fi)
    np.testing.assert_array_equal(np.asarray(fast.image),
                                  np.asarray(full.image))
    assert fast.zbuf is None and full.zbuf is not None


def test_three_operand_feed_matches_legacy():
    """The stack-free 3-operand kernel is bit-identical to the round-3
    (4, N)-stack feed."""
    from pointcloud_depthfusion_tpu.ops.pallas.zresolve_pallas import (
        invalid_pixel_id,
        zresolve_sorted_entries,
    )

    rng = np.random.default_rng(1)
    n_px = 1000
    n = 4096
    pix = rng.integers(0, n_px, size=n).astype(np.int32)
    pix[rng.random(n) < 0.1] = invalid_pixel_id(n_px)
    zbits = rng.integers(1, 1 << 30, size=n).astype(np.int32)
    rgb = rng.integers(0, 1 << 24, size=n).astype(np.int32)
    args = (jnp.asarray(pix), jnp.asarray(zbits), jnp.asarray(rgb), n_px)
    a = zresolve_sorted_entries(*args, tile_px=64, chunk=256, interpret=True)
    b = zresolve_sorted_entries(*args, tile_px=64, chunk=256, interpret=True,
                                legacy_feed=True)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
