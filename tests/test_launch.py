"""One-command deployment composition (nodes/launch.py): the ros2-launch
equivalent must stand up cameras + fusion + registration (+ optional TCP
hop and viewer) from one manifest and flow fused frames end to end."""

import os

import numpy as np
import yaml

from pointcloud_depthfusion_tpu.nodes.launch import (
    load_manifest,
    run_deployment,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dual_deployment_end_to_end(tmp_path):
    """2 synthetic cameras + fusion + registration + PNG viewer, composed
    in-process from the example manifest: fused frames flow, registration
    ticks produce a fitness, PNGs land."""
    manifest = load_manifest(
        os.path.join(REPO, "configs", "deployment_dual.yaml")
    )
    manifest = dict(manifest)
    manifest["viewer"] = {"out_dir": str(tmp_path / "viewer"), "every_n": 4}
    summary = run_deployment(manifest, cpu=True, frames=8)
    assert summary["tier"] == "dual"
    assert summary["frames"] == 8
    assert summary["fused_coverage"] and summary["fused_coverage"] > 0.3
    assert summary["registration_fitness"] is not None
    assert summary["saved_pngs"] >= 1
    assert any(f.startswith("fused") for f in os.listdir(tmp_path / "viewer"))


def test_dual_deployment_with_tcp_hop(tmp_path):
    """The cross-machine composition: camera_left also serves its frameset
    stream over TCP (`serve:`), and a second manifest camera consumes it as
    `source: tcp://…` — the two-Jetson DDS hop (README.md:14-34) in one
    process. Phase 1 starts the server; phase 2 composes against it."""
    import threading

    from pointcloud_depthfusion_tpu.core.camera import Intrinsics
    from pointcloud_depthfusion_tpu.io.feeder import SyntheticSource
    from pointcloud_depthfusion_tpu.io.network import FramesetStreamServer
    from pointcloud_depthfusion_tpu.io.synthetic import (
        SyntheticScene,
        two_camera_rig,
    )

    w, h = 64, 48
    fx = 631.0 * w / 848.0
    intr = Intrinsics.create(w, h, fx=fx, fy=fx, ppx=w / 2, ppy=h / 2)
    wl, wr = two_camera_rig(baseline=0.6, toe_in_deg=10.0)
    remote = SyntheticSource(SyntheticScene(), intr, wr, seed=20)
    srv = FramesetStreamServer(remote, name="camera_right", codec="raw")
    srv.start()
    try:
        manifest = {
            "width": w,
            "height": h,
            "cameras": [
                {"name": "camera_left", "source": "synthetic", "seed": 10,
                 "pose": "left"},
                {"name": "camera_right",
                 "source": f"tcp://127.0.0.1:{srv.port}"},
            ],
            "registration": {"every_n_frames": 0},
        }
        summary = run_deployment(manifest, cpu=True, frames=4)
    finally:
        srv.stop()
    assert summary["frames"] == 4
    assert summary["fused_coverage"] and summary["fused_coverage"] > 0.3


def test_served_camera_also_fuses_locally(tmp_path):
    """A camera with `serve:` is consumed by BOTH the local fusion feeder
    and a remote TCP client. The server reads a subscription tee — two
    direct pullers would steal alternating frames from each other (halving
    the local rate and racing the temporal-filter state), so this asserts
    the local deployment keeps its full frame count WHILE a live remote
    client simultaneously receives frames."""
    import threading
    import time

    from pointcloud_depthfusion_tpu.io.network import NetworkSource

    manifest = {
        "width": 64,
        "height": 48,
        "cameras": [
            {"name": "camera_left", "source": "synthetic", "seed": 10,
             "pose": "left", "serve": "127.0.0.1:7461"},
            {"name": "camera_right", "source": "synthetic", "seed": 20,
             "pose": "right"},
        ],
        "registration": {"every_n_frames": 0},
    }
    res: dict = {}
    th = threading.Thread(
        target=lambda: res.update(run_deployment(manifest, cpu=True,
                                                 frames=40))
    )
    th.start()
    src = None
    try:
        deadline = time.time() + 20
        while src is None:
            try:
                src = NetworkSource("127.0.0.1", 7461, timeout_s=10)
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.2)
        got = [src.next_frame() for _ in range(3)]
        assert all(f is not None for f in got)
        assert got[0].depth.shape == (48, 64)
    finally:
        if src is not None:
            src.close()
        th.join(timeout=120)
    assert not th.is_alive()
    # Local fusion saw EVERY synchronized pair — no frame stealing.
    assert res["frames"] == 40
    assert res["fused_coverage"] and res["fused_coverage"] > 0.3
    assert res["served_ports"] == [7461]


def test_rig_deployment_three_cameras(tmp_path):
    """3+ cameras compose the rig tier from the same manifest schema."""
    manifest = {
        "width": 64,
        "height": 48,
        "cameras": [
            {"name": f"cam{i}", "source": "synthetic", "seed": 10 + i,
             "pose": i}
            for i in range(3)
        ],
        "registration": {"every_n_frames": 0},
        "viewer": {"out_dir": str(tmp_path / "rigview"), "every_n": 2},
    }
    summary = run_deployment(manifest, cpu=True, frames=4)
    assert summary["tier"] == "rig"
    assert summary["frames"] == 4
    assert summary["fused_coverage"] and summary["fused_coverage"] > 0.3
    assert summary["saved_pngs"] >= 1


def test_manifest_validation(tmp_path):
    import pytest

    bad = tmp_path / "bad.yaml"
    bad.write_text("deployment: {}\n")
    with pytest.raises(ValueError, match="cameras"):
        load_manifest(str(bad))

    one_cam = {"cameras": [{"name": "only", "source": "synthetic"}]}
    with pytest.raises(ValueError, match="at least 2"):
        run_deployment(one_cam, cpu=True, frames=1)


def test_rig_manifest_example_parses_and_runs(tmp_path):
    """The shipped 4-camera example manifest composes and flows (scaled
    down for the CPU suite: small frames, registration off, few frames)."""
    manifest = dict(load_manifest(
        os.path.join(REPO, "configs", "deployment_rig4.yaml")
    ))
    manifest.update(width=64, height=48,
                    registration={"every_n_frames": 0},
                    viewer={"out_dir": str(tmp_path / "v"), "every_n": 2})
    summary = run_deployment(manifest, cpu=True, frames=3)
    assert summary["tier"] == "rig" and summary["cameras"] == 4
    assert summary["frames"] == 3
    assert summary["fused_coverage"] and summary["fused_coverage"] > 0.3
