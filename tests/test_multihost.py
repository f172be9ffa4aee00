"""Process-spanning mesh test: 2 processes × 2 virtual CPU devices fuse a
4-camera rig; the result must equal the single-process sharded result.

The multi-host analogue of the reference's two-Jetson DDS deployment
(README.md:14-34) — SURVEY §2.8's "DCN only between hosts" mapping, with
gloo standing in for DCN on CPU."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rig_fusion_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "fused.npy")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m",
                "pointcloud_depthfusion_tpu.parallel.multihost",
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--local-devices", "2",
            ]
            + (["--out", out] if pid == 0 else []),
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    logs = [p.communicate(timeout=570)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-2000:]
    assert "coverage" in logs[0]
    fused = np.load(out)

    # Single-process reference: same 4 cameras on a 4-device local mesh.
    script = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.fusion.pipeline import FusionConfig
from pointcloud_depthfusion_tpu.io.synthetic import SyntheticScene
from pointcloud_depthfusion_tpu.parallel.mesh import make_camera_mesh, rig_fuse_sharded
w, h = 64, 48
intr = Intrinsics.create(w, h, fx=50.0, fy=50.0, ppx=w/2, ppy=h/2)
scene = SyntheticScene()
depths, colors, poses = [], [], []
for i in range(4):
    yaw = np.deg2rad(-15 + 30 * i / 3)
    rot = np.array([[np.cos(yaw),0,np.sin(yaw)],[0,1,0],[-np.sin(yaw),0,np.cos(yaw)]])
    m = np.eye(4); m[:3,:3] = rot; m[:3,3] = [0.8*(i/3-0.5),0,0]
    poses.append(m.astype(np.float32))
    fs = scene.render(intr, m)
    depths.append(fs.depth); colors.append(fs.color)
mesh = make_camera_mesh(4)
cfg = FusionConfig.create(vertical_image=False, mirror_image=False, filter_fused_color=False)
fn = rig_fuse_sharded(mesh, intr, intr, cfg)
import jax.numpy as jnp
img = np.asarray(fn(jnp.asarray(np.stack(depths)), jnp.asarray(np.stack(colors)),
                    jnp.full((4,), 0.001, jnp.float32), jnp.asarray(np.stack(poses))))
np.save(os.environ["OUT_REF"], img)
"""
    out_ref = str(tmp_path / "fused_ref.npy")
    env2 = dict(os.environ)
    env2["JAX_PLATFORMS"] = "cpu"
    env2.pop("XLA_FLAGS", None)
    env2["OUT_REF"] = out_ref
    r = subprocess.run([sys.executable, "-c", script], env=env2, cwd=repo,
                       capture_output=True, text=True, timeout=570)
    assert r.returncode == 0, r.stderr[-2000:]
    want = np.load(out_ref)
    np.testing.assert_array_equal(fused, want)
