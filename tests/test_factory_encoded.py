"""Config factories, encoded framesets, camera dynamic reconfiguration."""

import numpy as np

from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.core.frameset import HostFrameset
from pointcloud_depthfusion_tpu.io.encoded import (
    EncodedFrameset,
    read_encoded_stream,
    write_encoded_stream,
)
from pointcloud_depthfusion_tpu.io.feeder import SyntheticSource
from pointcloud_depthfusion_tpu.io.synthetic import SyntheticScene, two_camera_rig
from pointcloud_depthfusion_tpu.nodes.camera_node import CameraNode
from pointcloud_depthfusion_tpu.utils import factory
from pointcloud_depthfusion_tpu.utils.config import ConfigTree


def test_default_fusion_config_loads():
    config, tree = factory.fusion_config()
    assert float(config.min_depth) == 0.5
    assert float(config.max_depth) == 3.0
    assert config.vertical_image and config.mirror_image
    assert config.render_mode == "tiled"
    assert tree.get("sync.max_interval_ms") == 17.0


def test_default_registration_settings_load():
    settings, tree = factory.registration_settings()
    assert settings.resolution == 0.01
    assert settings.max_iterations == 64
    assert settings.adjust_resolution
    assert tree.get("spin_rate") == 0.5
    # round-4 knobs ride the YAML tier with reference-faithful defaults:
    # the reference node hard-sets the kernelized multi-voxel search
    # (GPU_RBF_KERNEL, registration.cpp:31) → shipped default is direct7.
    assert settings.neighbor_search == "direct7"
    assert settings.outlier_removal is False


def test_round4_settings_override(tmp_path):
    p = tmp_path / "override.yaml"
    p.write_text(
        "registration_node:\n"
        "  neighbor_search: direct7\n"
        "  outlier_removal: true\n"
        "  outlier_stddev_mul: 2.5\n"
    )
    settings, _ = factory.registration_settings(str(p))
    assert settings.neighbor_search == "direct7"
    assert settings.outlier_removal is True
    assert settings.outlier_stddev_mul == 2.5

    q = tmp_path / "override2.yaml"
    q.write_text("fusion_node:\n  emit_zbuf: false\n")
    config, _ = factory.fusion_config(str(q))
    assert config.emit_zbuf is False


def test_fusion_config_override(tmp_path):
    p = tmp_path / "override.yaml"
    p.write_text("fusion_node:\n  max_depth: 2.0\n  render_mode: exact\n")
    config, _ = factory.fusion_config(str(p))
    assert float(config.max_depth) == 2.0
    assert config.render_mode == "exact"


def test_camera_config_and_dynamic_params():
    cfg = factory.camera_config("camera_left")
    assert cfg.get("sensor.depth.temporal_alpha") == 0.4
    scene = SyntheticScene()
    wl, _ = two_camera_rig()
    intr = Intrinsics.create(32, 24, fx=30.0, fy=30.0, ppx=16.0, ppy=12.0)
    node = CameraNode("camera_left", SyntheticSource(scene, intr, wl))
    node.attach_config(cfg)
    assert node.temporal_alpha == 0.4
    cfg.set("sensor.depth.temporal_alpha", 0.6)
    assert node.temporal_alpha == 0.6
    cfg.set("fps", 15.0)
    assert node.fps == 15.0


def test_encoded_frameset_round_trip(rng):
    fs = HostFrameset(
        depth=rng.integers(0, 4000, (24, 32)).astype(np.uint16),
        color=rng.integers(0, 255, (24, 32, 3)).astype(np.uint8),
        timestamp=12.345,
        depth_scale=0.001,
    )
    enc = EncodedFrameset.encode(fs)
    assert len(enc.to_bytes()) < fs.depth.nbytes + fs.color.nbytes + 4096
    back = EncodedFrameset.from_bytes(enc.to_bytes()).decode()
    np.testing.assert_array_equal(back.depth, fs.depth)
    np.testing.assert_array_equal(back.color, fs.color)
    assert abs(back.timestamp - fs.timestamp) < 1e-9
    assert back.depth_scale == fs.depth_scale


def test_encoded_stream_file(tmp_path, rng):
    frames = [
        HostFrameset(
            depth=rng.integers(0, 4000, (16, 16)).astype(np.uint16),
            color=rng.integers(0, 255, (16, 16, 3)).astype(np.uint8),
            timestamp=float(i),
        )
        for i in range(3)
    ]
    path = str(tmp_path / "stream.pdfe")
    write_encoded_stream(path, frames)
    back = read_encoded_stream(path)
    assert len(back) == 3
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a.depth, b.depth)
        np.testing.assert_array_equal(a.color, b.color)


def test_node_kwargs_from_tree(tmp_path):
    """The node-level YAML keys (sync window, profiling, save_data,
    spin_rate) must reach the node constructors."""
    from pointcloud_depthfusion_tpu.utils import factory

    p = tmp_path / "ov.yaml"
    p.write_text(
        "fusion_node:\n"
        "  save_data: true\n"
        "  sync:\n    max_interval_ms: 25.0\n"
        "  profiling:\n    enable_profiling: true\n    filename: f.csv\n"
    )
    _, tree = factory.fusion_config(str(p))
    kw = factory.fusion_node_kwargs_from_tree(tree)
    assert kw["max_sync_interval_s"] == 0.025
    assert kw["profiling_path"] == "f.csv"
    assert kw["save_data_dir"] == "save_data"
    # streaming defaults ride the tree too (default YAML: 1 s lifespan)
    assert kw["donate"] is True and kw["async_readback"] is True
    assert kw["lifespan_s"] == 1.0
    assert kw["pack_color"] is False  # default off (costs +4 B/px upload)

    p1b = tmp_path / "ov1b.yaml"
    p1b.write_text(
        "fusion_node:\n  donate: false\n  async_readback: false\n"
        "  pack_color: true\n"
        "  qos:\n    lifespan_s: 0.0\n"
    )
    _, tree1b = factory.fusion_config(str(p1b))
    kw1b = factory.fusion_node_kwargs_from_tree(tree1b)
    assert kw1b["donate"] is False and kw1b["async_readback"] is False
    assert kw1b["pack_color"] is True
    # explicit 0 DISABLES the drop (must not fall back to any default)
    assert kw1b["lifespan_s"] is None

    p2 = tmp_path / "ov2.yaml"
    p2.write_text(
        "registration_node:\n  spin_rate: 2.0\n"
        "  profiling:\n    enable_profiling: true\n"
    )
    _, rtree = factory.registration_settings(str(p2))
    rkw = factory.registration_node_kwargs_from_tree(rtree)
    assert rkw["spin_rate_hz"] == 2.0
    assert rkw["profiling_path"] == "registration_node_profiling.txt"


def test_config_set_through_scalar_leaf_raises_clearly():
    """Dynamic reconfiguration through an existing scalar leaf must name
    the colliding path, not die with an opaque TypeError."""
    import pytest

    from pointcloud_depthfusion_tpu.utils.config import ConfigTree

    t = ConfigTree({"sync": 5})
    with pytest.raises(ValueError, match="'sync' is a scalar"):
        t.set("sync.max_interval_ms", 20)
    # namespaces still auto-create through missing keys
    t.set("debug.save_data", True)
    assert t.get("debug.save_data") is True


def test_fusion_node_kwargs_plumb_documented_yaml_knobs():
    """qos_history_depth ('feeder queue depth'), sync.queue_size and
    profiling.log_size are documented YAML keys — they must actually reach
    DeviceFeeder/ApproximateTimePairer/StageLog instead of being ignored."""
    from pointcloud_depthfusion_tpu.utils import factory
    from pointcloud_depthfusion_tpu.utils.config import ConfigTree

    cfg = ConfigTree({
        "qos_history_depth": 7,
        "sync": {"max_interval_ms": 20.0, "queue_size": 4},
        "profiling": {"enable_profiling": True, "filename": "p.txt",
                      "log_size": 10},
    })
    kwargs = factory.fusion_node_kwargs_from_tree(cfg)
    assert kwargs["feeder_depth"] == 7
    assert kwargs["sync_queue_size"] == 4
    assert kwargs["profiling_log_size"] == 10
    assert kwargs["profiling_path"] == "p.txt"
