"""Registration service tests on synthetic depth-frame pairs."""

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.io.synthetic import (
    SyntheticScene,
    right_to_left_transform,
    two_camera_rig,
)
from pointcloud_depthfusion_tpu.registration.pipeline import (
    RegistrationPipeline,
    RegistrationSettings,
    load_transform_file,
    save_transform_file,
)


W, H = 106, 60


def small_intr():
    return Intrinsics.create(W, H, fx=80.0, fy=80.0, ppx=W / 2, ppy=H / 2)


def make_depth_pair(noise=0.002):
    scene = SyntheticScene()
    intr = small_intr()
    wl, wr = two_camera_rig(baseline=0.4, toe_in_deg=6.0)
    fl = scene.render(intr, wl, depth_noise_std=noise, seed=3)
    fr = scene.render(intr, wr, depth_noise_std=noise, seed=4)
    return fl.depth, fr.depth, right_to_left_transform(wl, wr), intr


def test_registration_converges_over_ticks():
    dl, dr, t_true, intr = make_depth_pair()
    settings = RegistrationSettings(
        resolution=0.02, voxelsize=0.01, initial_resolution=0.12,
        resolution_step=0.05, max_iterations=48, discard_transform=False,
        reset_initial_guess=False,
    )
    pipe = RegistrationPipeline(intr, intr, settings)
    for _ in range(5):  # annealing schedule: 0.12 → 0.07 → 0.02
        t = pipe.tick(dl, dr)
    err_t = np.linalg.norm(t[:3, 3] - t_true[:3, 3])
    dr_mat = t[:3, :3] @ t_true[:3, :3].T
    ang = np.rad2deg(np.arccos(np.clip((np.trace(dr_mat) - 1) / 2, -1, 1)))
    assert err_t < 0.02, (err_t, ang)
    assert ang < 1.5, (err_t, ang)
    assert not pipe.initial_phase
    assert len(pipe.telemetry) == 5
    # Annealing must end strictly better than the coarse first tick.
    assert pipe.telemetry[-1].fitness < pipe.telemetry[0].fitness


def test_gating_discards_implausible(tmp_path):
    dl, dr, t_true, intr = make_depth_pair()
    settings = RegistrationSettings(
        resolution=0.05, voxelsize=0.02, adjust_resolution=False,
        max_iterations=8, discard_transform=True,
    )
    pipe = RegistrationPipeline(intr, intr, settings)
    pipe.best_fitness = 1e-12  # force every result to be "worse"
    before = pipe.initial_transform.copy()
    pipe.tick(dl, dr)
    # discarded → transform unchanged, best_fitness decayed
    np.testing.assert_array_equal(pipe.last_transform, before)
    assert pipe.telemetry[-1].discarded
    assert pipe.best_fitness > 1e-12


def test_guess_reset_on_registration_failure():
    # An empty source frame yields zero correspondences → fitness is the
    # failure sentinel (f32 max) → the initial guess resets to start
    # (registration_node.cpp:396-407 semantics).
    dl, dr, t_true, intr = make_depth_pair()
    settings = RegistrationSettings(
        resolution=0.05, voxelsize=0.02, adjust_resolution=False,
        max_iterations=2, discard_transform=False, reset_initial_guess=True,
    )
    pipe = RegistrationPipeline(intr, intr, settings)
    pipe.initial_transform = np.diag([1.0, 1, 1, 1]).astype(np.float32)
    pipe.initial_transform[0, 3] = 0.7  # non-start warm state
    empty = np.zeros_like(dr)
    pipe.tick(dl, empty)
    assert pipe.telemetry[-1].guess_reset
    np.testing.assert_array_equal(pipe.last_transform, pipe.start_transform)


def test_transform_save_load_roundtrip(tmp_path):
    path = str(tmp_path / "transform.txt")
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [0.1, -0.2, 0.3]
    save_transform_file(path, t)
    loaded = load_transform_file(path)
    np.testing.assert_allclose(loaded, t, atol=1e-7)
    # corrupt file → None (identity fallback semantics)
    with open(path, "w") as fh:
        fh.write("not a matrix")
    assert load_transform_file(path) is None


def test_profiling_csv(tmp_path):
    dl, dr, _, intr = make_depth_pair()
    settings = RegistrationSettings(
        resolution=0.05, voxelsize=0.02, adjust_resolution=False, max_iterations=4,
        discard_transform=False, reset_initial_guess=False,
    )
    pipe = RegistrationPipeline(intr, intr, settings)
    pipe.tick(dl, dr)
    path = str(tmp_path / "prof.csv")
    pipe.write_profiling_csv(path)
    lines = open(path).read().strip().split("\n")
    assert lines[0] == (
        "euclidean_fitness,icp_duration,points_target,points_source,"
        "target_grid_rebuilt"
    )
    assert len(lines) == 2
    assert lines[1].endswith(",1")  # first tick always builds the grid


def test_target_grid_cache_matches_rebuild():
    """A tick that reuses the cached target grid produces EXACTLY the
    result of rebuilding it (the scene is unchanged), and telemetry records
    the reuse."""
    dl, dr, _, intr = make_depth_pair()
    settings = RegistrationSettings(
        resolution=0.05, voxelsize=0.02, adjust_resolution=False,
        max_iterations=8, discard_transform=False, reset_initial_guess=False,
        target_grid_cache_ticks=4,
    )
    cached = RegistrationPipeline(intr, intr, settings)
    fresh = RegistrationPipeline(
        intr, intr,
        RegistrationSettings(
            **{**settings.__dict__, "target_grid_cache_ticks": 1}
        ),
    )
    for i in range(3):
        t_c = cached.tick(dl, dr)
        t_f = fresh.tick(dl, dr)
        np.testing.assert_array_equal(t_c, t_f)
    assert [t.target_grid_rebuilt for t in cached.telemetry] == [True, False, False]
    assert [t.target_grid_rebuilt for t in fresh.telemetry] == [True, True, True]


def test_target_grid_cache_invalidated_by_annealing():
    dl, dr, _, intr = make_depth_pair()
    settings = RegistrationSettings(
        resolution=0.02, voxelsize=0.01, initial_resolution=0.12,
        resolution_step=0.05, max_iterations=8,
        discard_transform=False, reset_initial_guess=False,
        target_grid_cache_ticks=100,
    )
    pipe = RegistrationPipeline(intr, intr, settings)
    for _ in range(4):
        pipe.tick(dl, dr)
    # Resolution changes every annealing tick → grid rebuilt each time until
    # the schedule bottoms out (0.12 → 0.07 → 0.02 → steady).
    assert [t.target_grid_rebuilt for t in pipe.telemetry] == [
        True, True, True, False,
    ]


def test_cam_upside_down_initial_guess():
    intr = small_intr()
    settings = RegistrationSettings(cam_upside_down=True, adjust_resolution=False)
    pipe = RegistrationPipeline(intr, intr, settings)
    # 180° about Z: x/y axes negated
    np.testing.assert_allclose(
        pipe.start_transform[:3, :3],
        np.diag([-1.0, -1.0, 1.0]),
        atol=1e-6,
    )
    np.testing.assert_array_equal(pipe.initial_transform, pipe.start_transform)


def test_registration_from_recorded_dataset(tmp_path):
    """BASELINE config 3: register a recorded frame pair from disk."""
    from pointcloud_depthfusion_tpu.io.feeder import SyntheticSource
    from pointcloud_depthfusion_tpu.io.recorded import RecordedSource, record_dataset
    from pointcloud_depthfusion_tpu.io.synthetic import SyntheticScene, two_camera_rig

    intr = small_intr()
    scene = SyntheticScene()
    wl, wr = two_camera_rig(baseline=0.4, toe_in_deg=6.0)
    t_true = right_to_left_transform(wl, wr)
    for name, pose, seed in (("left", wl, 3), ("right", wr, 4)):
        src = SyntheticSource(scene, intr, pose, depth_noise_std=0.002, seed=seed)
        record_dataset(str(tmp_path / f"{name}.npz"),
                       [src.next_frame() for _ in range(2)], intr)

    left = RecordedSource(str(tmp_path / "left.npz"))
    right = RecordedSource(str(tmp_path / "right.npz"))
    settings = RegistrationSettings(
        resolution=0.02, voxelsize=0.01, initial_resolution=0.12,
        resolution_step=0.05, max_iterations=48,
        discard_transform=False, reset_initial_guess=False,
    )
    pipe = RegistrationPipeline(left.intrinsics, right.intrinsics, settings)
    fl, fr = left.next_frame(), right.next_frame()
    for _ in range(4):
        t = pipe.tick(fl.depth, fr.depth)
    assert np.linalg.norm(t[:3, 3] - t_true[:3, 3]) < 0.02


def test_warm_ticks_enable_fitness_plateau():
    """The relative fitness-plateau exit is off during annealing (cold
    solves may stall before improving) and on for warm ticks (f32 step
    noise otherwise burns the full iteration budget)."""
    intr = small_intr()
    settings = RegistrationSettings(
        resolution=0.02, voxelsize=0.01, initial_resolution=0.12,
        resolution_step=0.05,
    )
    pipe = RegistrationPipeline(intr, intr, settings)
    assert float(pipe._make_config().fitness_rel_eps) == 0.0
    pipe.initial_phase = False
    # ...but only once a previous tick produced a warm start
    assert float(pipe._make_config().fitness_rel_eps) == 0.0
    pipe._warm_start = True
    assert abs(float(pipe._make_config().fitness_rel_eps) - 5e-3) < 1e-6
    # a guess reset falls back to cold criteria; adjust_resolution=False
    # configs reach warm criteria after their first tick too
    nosched = RegistrationPipeline(
        intr, intr,
        RegistrationSettings(resolution=0.05, voxelsize=0.02,
                             adjust_resolution=False),
    )
    assert not nosched.initial_phase
    assert float(nosched._make_config().fitness_rel_eps) == 0.0


def test_transform_angles_fit_upside_down():
    """Upside-down gating must ACCEPT ~180-deg-about-z solves (the
    reference widens the wrong euler axis and discards every one,
    registration_node.cpp:368 — see transform_angles_fit docstring)."""
    from pointcloud_depthfusion_tpu.registration.pipeline import (
        transform_angles_fit,
    )

    def rz(deg):
        a = np.deg2rad(deg)
        m = np.eye(4)
        m[:3, :3] = [
            [np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]
        ]
        return m

    assert transform_angles_fit(rz(179.2), cam_upside_down=True)
    assert transform_angles_fit(rz(-179.5), cam_upside_down=True)
    assert not transform_angles_fit(rz(170.0), cam_upside_down=True)
    assert not transform_angles_fit(rz(1.0), cam_upside_down=True)
    assert transform_angles_fit(rz(1.0), cam_upside_down=False)
    assert not transform_angles_fit(rz(179.0), cam_upside_down=False)


def test_outlier_removal_prefilter_tick():
    """outlier_removal=True wires statistical_outlier_removal into the
    cloud prep; a tick still converges, and telemetry's cloud sizes shrink
    versus the unfiltered run when salt outliers contaminate the frames."""
    dl, dr, t_true, intr = make_depth_pair()
    # salt a few far-depth outlier pixels into both frames
    rng = np.random.default_rng(0)
    dl = dl.copy()
    dr = dr.copy()
    ys = rng.integers(0, dl.shape[0], 12)
    xs = rng.integers(0, dl.shape[1], 12)
    dl[ys, xs] = 2900  # 2.9 m — inside the depth window, far off-surface
    dr[ys, xs] = 2900

    def run(outliers):
        settings = RegistrationSettings(
            resolution=0.02, voxelsize=0.01, initial_resolution=0.12,
            resolution_step=0.05, max_iterations=48,
            discard_transform=False, reset_initial_guess=False,
            outlier_removal=outliers, outlier_resolution=0.06,
            outlier_stddev_mul=1.0,
        )
        pipe = RegistrationPipeline(intr, intr, settings)
        for _ in range(5):  # annealing 0.12 → 0.07 → 0.02
            t = pipe.tick(dl, dr)
        return t, pipe.telemetry[-1]

    t_f, tel_f = run(True)
    t_n, tel_n = run(False)
    # the isolated far points are dropped from both clouds
    assert tel_f.source_points < tel_n.source_points
    assert tel_f.target_points < tel_n.target_points
    err_t = np.linalg.norm(t_f[:3, 3] - t_true[:3, 3])
    assert err_t < 0.05, err_t
