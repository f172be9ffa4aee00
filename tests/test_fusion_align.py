"""Fusion with unaligned depth (align_frames=True, L515-style geometry)."""

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.core.camera import Extrinsics, Intrinsics
from pointcloud_depthfusion_tpu.core.frameset import Frameset
from pointcloud_depthfusion_tpu.fusion.pipeline import FusionConfig, FusionPipeline
from pointcloud_depthfusion_tpu.io.synthetic import (
    SyntheticScene,
    right_to_left_transform,
    two_camera_rig,
)


def test_fuse_with_unaligned_depth():
    """Depth at a different resolution/pose than color, aligned on-device.

    Renders the depth image from a slightly offset 'depth sensor' pose at a
    different resolution; align_frames=True must reproject it onto the color
    grid inside the fused program. The fused output should still cover the
    scene and match the aligned-input run closely.
    """
    scene = SyntheticScene()
    color_intr = Intrinsics.create(80, 60, fx=62.0, fy=62.0, ppx=40.0, ppy=30.0)
    depth_intr = Intrinsics.create(64, 48, fx=50.0, fy=50.0, ppx=32.0, ppy=24.0)
    wl, wr = two_camera_rig(baseline=0.4, toe_in_deg=6.0)
    t_rl = right_to_left_transform(wl, wr)

    # depth sensor sits 15 mm to the left of the color sensor
    d2c = Extrinsics.create(np.eye(3), [0.015, 0.0, 0.0])
    offset = np.eye(4)
    offset[:3, 3] = -np.asarray([0.015, 0.0, 0.0])  # world pose of depth cam

    def make(world_cam):
        color_fs = scene.render(color_intr, world_cam)
        depth_fs = scene.render(depth_intr, world_cam @ offset)
        return Frameset(
            depth=jnp.asarray(depth_fs.depth),
            color=jnp.asarray(color_fs.color),
            depth_intrinsics=depth_intr,
            color_intrinsics=color_intr,
            depth_to_color=d2c,
            depth_scale=jnp.asarray(0.001, jnp.float32),
            timestamp=jnp.asarray(0.0, jnp.float32),
            timestamp_epoch=jnp.asarray(0.0, jnp.float32),
        )

    left = make(wl)
    right = make(wr)

    config = FusionConfig.create(
        vertical_image=False, mirror_image=False, align_frames=True,
        filter_fused_color=False,
    )
    pipe = FusionPipeline(color_intr, config, donate=False)
    pipe.set_right_transform(t_rl)
    res = pipe.process(left, right)
    img = np.asarray(res.image)
    assert img.shape == (60, 80, 3)
    coverage = (img.sum(-1) > 0).mean()
    assert coverage > 0.5, coverage

    # Compare against directly-aligned inputs (render depth from the color
    # pose at color resolution): geometry should agree for most pixels.
    def make_aligned(world_cam):
        fs = scene.render(color_intr, world_cam)
        return Frameset.create(fs.depth, fs.color, color_intr)

    config2 = FusionConfig.create(
        vertical_image=False, mirror_image=False, align_frames=False,
        filter_fused_color=False,
    )
    pipe2 = FusionPipeline(color_intr, config2, donate=False)
    pipe2.set_right_transform(t_rl)
    res2 = pipe2.process(make_aligned(wl), make_aligned(wr))
    zb1 = np.asarray(res.zbuf)
    zb2 = np.asarray(res2.zbuf)
    both = (zb1 < 1e37) & (zb2 < 1e37)
    assert both.mean() > 0.4
    err = np.abs(zb1[both] - zb2[both])
    # lower-res depth + splat quantization: agree to ~2 cm for most pixels
    assert np.quantile(err, 0.7) < 0.02, np.quantile(err, [0.5, 0.7, 0.9])
