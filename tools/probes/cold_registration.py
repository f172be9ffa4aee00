"""Cold-registration probe: full annealing schedule on-device, per-tick ms,
plus executable-sharing evidence (traced damping => one compile)."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import tpu_check
from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.io.synthetic import SyntheticScene, two_camera_rig
from pointcloud_depthfusion_tpu.registration.pipeline import (
    RegistrationPipeline, RegistrationSettings)
from pointcloud_depthfusion_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

w, h = 848, 480
intr = Intrinsics.create(w, h, fx=631.0, fy=631.0, ppx=w/2, ppy=h/2)
scene = SyntheticScene()
wl, wr = two_camera_rig(baseline=0.6, toe_in_deg=10.0)
fl = scene.render(intr, wl, depth_noise_std=0.002, hole_fraction=0.01)
fr = scene.render(intr, wr, depth_noise_std=0.002, hole_fraction=0.01, seed=1)

s = RegistrationSettings(resolution=0.02, voxelsize=0.01,
                         initial_resolution=0.12, resolution_step=0.05,
                         max_iterations=48)
pipe = RegistrationPipeline(intr, intr, settings=s)
print("pipeline built", flush=True)
import jax as _j; print("devices:", _j.devices(), flush=True)

t00 = time.perf_counter()
total_iters = 0
for tick in range(8):
    t0 = time.perf_counter()
    T = pipe.tick(fl.depth, fr.depth)
    ms = (time.perf_counter() - t0) * 1e3
    tel = pipe.telemetry[-1]
    total_iters += tel.iterations
    print(f"tick {tick}: {ms:7.1f} ms res {pipe.current_resolution:.3f} "
          f"iters {tel.iterations} fitness {tel.fitness:.2e} "
          f"rebuilt {tel.target_grid_rebuilt} discarded {tel.discarded}",
          flush=True)
print(f"total wall {time.perf_counter()-t00:.1f}s, total GN iters {total_iters}")
import __graft_entry__ as g
from pointcloud_depthfusion_tpu.io.synthetic import right_to_left_transform
true_t = right_to_left_transform(wl, wr)
err = np.abs(np.asarray(T) - true_t).max()
print("pose error vs truth:", err)
