"""PointCloud API-parity class tests."""

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.core.camera import (
    Intrinsics,
    model_preset,
)
from pointcloud_depthfusion_tpu.core.frameset import Frameset
from pointcloud_depthfusion_tpu.core.pointcloud import PointCloud
from pointcloud_depthfusion_tpu.io.synthetic import SyntheticScene, two_camera_rig


def make_frameset():
    intr = Intrinsics.create(64, 48, fx=50.0, fy=50.0, ppx=32.0, ppy=24.0)
    scene = SyntheticScene()
    wl, _ = two_camera_rig()
    fs = scene.render(intr, wl)
    return Frameset.create(fs.depth, fs.color, intr), intr


def test_deproject_transform_project_roundtrip():
    fs, intr = make_frameset()
    cloud = PointCloud.deproject(fs, min_depth=0.5, max_depth=4.0)
    assert cloud.capacity == 64 * 48
    assert int(cloud.count()) > 2000
    img, zbuf = cloud.project(intr)
    # re-projecting an unmoved cloud reproduces the valid color pixels
    got = np.asarray(img)
    want = np.asarray(fs.color)
    covered = np.asarray(zbuf) < 1e37
    assert covered.mean() > 0.8
    np.testing.assert_array_equal(got[covered], want[covered])


def test_append_and_transform():
    fs, intr = make_frameset()
    a = PointCloud.deproject(fs)
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [0.1, 0, 0]
    b = a.transform(t)
    merged = a.append(b)
    assert merged.capacity == 2 * a.capacity
    pts_a, _ = a.to_host()
    pts_b, _ = b.to_host()
    np.testing.assert_allclose(pts_b[:, 0] - pts_a[:, 0], 0.1, atol=1e-6)


def test_to_host_compacts():
    fs, intr = make_frameset()
    cloud = PointCloud.deproject(fs, min_depth=0.5, max_depth=2.0)
    pts, cols = cloud.to_host()
    assert pts.shape[0] == int(cloud.count())
    assert (pts[:, 2] >= 0.49).all() and (pts[:, 2] <= 2.01).all()


def test_save_ply(tmp_path):
    fs, intr = make_frameset()
    cloud = PointCloud.deproject(fs)
    p = str(tmp_path / "cloud.ply")
    cloud.save_ply(p)
    from pointcloud_depthfusion_tpu.io.artifacts import load_ply

    pts = load_ply(p)
    assert pts.shape[0] == int(cloud.count())


def test_model_presets():
    p = model_preset("Intel RealSense L515")
    assert p["depth_size"] == (1024, 768) and p["depth_scale"] == 0.00025
    assert model_preset("d455")["depth_size"] == (1280, 720)
    try:
        model_preset("nope")
        assert False
    except KeyError:
        pass


def test_registration_debug_clouds():
    from pointcloud_depthfusion_tpu.registration.pipeline import (
        RegistrationPipeline,
        RegistrationSettings,
    )
    from pointcloud_depthfusion_tpu.io.synthetic import right_to_left_transform

    intr = Intrinsics.create(64, 48, fx=50.0, fy=50.0, ppx=32.0, ppy=24.0)
    scene = SyntheticScene()
    wl, wr = two_camera_rig(baseline=0.3, toe_in_deg=5.0)
    fl = scene.render(intr, wl)
    fr = scene.render(intr, wr)
    pipe = RegistrationPipeline(
        intr, intr,
        RegistrationSettings(resolution=0.05, voxelsize=0.02,
                             adjust_resolution=False, max_iterations=8,
                             discard_transform=False, reset_initial_guess=False,
                             publish_clouds=True),
    )
    pipe.tick(fl.depth, fr.depth)
    assert pipe.debug_clouds is not None
    assert pipe.debug_clouds["target"].shape[1] == 3
    assert pipe.debug_clouds["aligned"].shape[1] == 3
    # 64×48 frame stride-decimated 2× (cloud_decimation default) → ~768
    # valid points; the tap must still carry a substantial compacted cloud.
    assert len(pipe.debug_clouds["target"]) > 500


def test_deproject_roi_applies_without_depth_window(rng):
    """roi must mask the cloud even when the depth window is the default
    (the filter used to be skipped entirely in that case)."""
    from pointcloud_depthfusion_tpu.core.frameset import Frameset
    from pointcloud_depthfusion_tpu.core.camera import Intrinsics
    from pointcloud_depthfusion_tpu.core.pointcloud import PointCloud

    intr = Intrinsics.create(32, 24, fx=28.0, fy=28.0, ppx=16.0, ppy=12.0)
    depth = rng.integers(400, 3000, (24, 32)).astype(np.uint16)
    color = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
    fs = Frameset.create(depth, color, intr)
    roi = (4, 4, 10, 10)
    cloud = PointCloud.deproject(fs, roi=roi)
    assert int(cloud.count()) <= 100  # 10x10 window
    full = PointCloud.deproject(fs)
    assert int(full.count()) == 24 * 32
