"""Feeder, pairing, recorded datasets, artifacts, config, profiling tests."""

import os

import numpy as np
import jax.numpy as jnp

from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.core.frameset import HostFrameset
from pointcloud_depthfusion_tpu.io.artifacts import (
    load_ply,
    load_png,
    save_ply,
    save_png,
)
from pointcloud_depthfusion_tpu.io.feeder import (
    ApproximateTimePairer,
    DeviceFeeder,
    SyntheticSource,
)
from pointcloud_depthfusion_tpu.io.recorded import RecordedSource, record_dataset
from pointcloud_depthfusion_tpu.io.synthetic import SyntheticScene, two_camera_rig
from pointcloud_depthfusion_tpu.utils.config import ConfigTree
from pointcloud_depthfusion_tpu.utils.profiling import FpsCounter, StageLog, StageTimer


def hf(ts):
    return HostFrameset(
        depth=np.zeros((4, 4), np.uint16), color=np.zeros((4, 4, 3), np.uint8),
        timestamp=ts,
    )


class TestPairer:
    def test_pairs_close_stamps(self):
        p = ApproximateTimePairer(max_interval_s=0.017)
        assert p.push(0, hf(0.000)) == []
        pairs = p.push(1, hf(0.005))
        assert len(pairs) == 1
        assert pairs[0][0].timestamp == 0.000 and pairs[0][1].timestamp == 0.005

    def test_rejects_distant_stamps(self):
        p = ApproximateTimePairer(max_interval_s=0.017)
        p.push(0, hf(0.0))
        assert p.push(1, hf(0.1)) == []

    def test_skips_to_best_match(self):
        p = ApproximateTimePairer(max_interval_s=0.017)
        p.push(0, hf(0.000))
        p.push(0, hf(0.033))
        pairs = p.push(1, hf(0.034))
        assert len(pairs) == 1
        assert pairs[0][0].timestamp == 0.033
        assert p.dropped >= 1  # the 0.000 frame was skipped

    def test_queue_bound(self):
        p = ApproximateTimePairer(max_interval_s=0.001, queue_size=3)
        for i in range(10):
            p.push(0, hf(i * 1.0))
        assert len(p.queues[0]) <= 3


def small_intr():
    return Intrinsics.create(64, 48, fx=50.0, fy=50.0, ppx=32.0, ppy=24.0)


def test_synthetic_source_stream():
    scene = SyntheticScene()
    wl, _ = two_camera_rig()
    src = SyntheticSource(scene, small_intr(), wl, fps=30.0)
    f0 = src.next_frame()
    f1 = src.next_frame()
    assert f0.depth.shape == (48, 64)
    assert abs((f1.timestamp - f0.timestamp) - 1 / 30.0) < 1e-6
    assert (f0.depth > 0).mean() > 0.8


def test_device_feeder_round_trip():
    scene = SyntheticScene()
    wl, wr = two_camera_rig()
    left = SyntheticSource(scene, small_intr(), wl, seed=1)
    right = SyntheticSource(scene, small_intr(), wr, seed=2)
    with DeviceFeeder(left, right) as feeder:
        seen = 0
        for pair in feeder:
            assert pair.left.depth.shape == (48, 64)
            # device stamp = quantized epoch + f32 offset; reconstruction
            # must match the host's f64 stamp to sub-ms
            absolute = float(pair.left.timestamp) + float(pair.left.timestamp_epoch)
            assert abs(absolute - pair.host_left.timestamp) < 1e-4
            seen += 1
            if seen >= 5:
                break
    assert seen == 5


def test_recorded_round_trip(tmp_path):
    scene = SyntheticScene()
    wl, _ = two_camera_rig()
    src = SyntheticSource(scene, small_intr(), wl, fps=30.0)
    frames = [src.next_frame() for _ in range(5)]
    # Per-frame depth scales survive the round trip (a recording that
    # flattened them to frame 0's value would silently rescale geometry).
    frames[3] = HostFrameset(
        depth=frames[3].depth, color=frames[3].color,
        timestamp=frames[3].timestamp, depth_scale=2.5e-4,
    )
    path = str(tmp_path / "rec.npz")
    record_dataset(path, frames, small_intr())
    rec = RecordedSource(path)
    assert len(rec) == 5
    f0 = rec.next_frame()
    np.testing.assert_array_equal(f0.depth, frames[0].depth)
    np.testing.assert_array_equal(f0.color, frames[0].color)
    assert f0.depth_scale == frames[0].depth_scale
    assert rec.intrinsics.width == 64
    for _ in range(2):
        rec.next_frame()
    assert rec.next_frame().depth_scale == 2.5e-4
    rec.idx = 0  # rewind for the count/EOS checks below
    rec.next_frame()
    for _ in range(4):
        rec.next_frame()
    assert rec.next_frame() is None
    # loop mode keeps timestamps monotonic
    rec2 = RecordedSource(path, loop=True)
    stamps = [rec2.next_frame().timestamp for _ in range(12)]
    assert all(b > a for a, b in zip(stamps, stamps[1:]))
    # fps reflects the recorded cadence (30 Hz synthetic source)
    assert abs(rec2.fps - 30.0) < 1.0, rec2.fps


def test_png_round_trip(tmp_path, rng):
    rgb = rng.integers(0, 255, (8, 10, 3)).astype(np.uint8)
    p = str(tmp_path / "a.png")
    save_png(p, rgb)
    np.testing.assert_array_equal(load_png(p), rgb)
    d16 = rng.integers(0, 65535, (8, 10)).astype(np.uint16)
    p2 = str(tmp_path / "d.png")
    save_png(p2, d16)
    np.testing.assert_array_equal(load_png(p2), d16)


def test_ply_round_trip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    for binary in (True, False):
        p = str(tmp_path / f"c_{binary}.ply")
        save_ply(p, pts, cols, binary=binary)
        got = load_ply(p)
        np.testing.assert_allclose(got, pts, atol=1e-6)


def test_config_tree(tmp_path):
    default = tmp_path / "config_default.yaml"
    default.write_text(
        "fusion_node:\n  ros__parameters:\n    min_depth: 0.5\n    max_depth: 2.0\n"
        "    profiling:\n      enable_profiling: false\n"
    )
    override = tmp_path / "config.yaml"
    override.write_text("fusion_node:\n  ros__parameters:\n    max_depth: 3.0\n")
    cfg = ConfigTree.load(str(default), str(override), node_key="fusion_node")
    assert cfg.get("min_depth") == 0.5
    assert cfg.get("max_depth") == 3.0  # override wins
    assert cfg.get("profiling.enable_profiling") is False
    changes = []
    cfg.on_change(lambda k, v: changes.append((k, v)))
    cfg.set("profiling.enable_profiling", True)
    assert cfg.get("profiling.enable_profiling") is True
    assert changes == [("profiling.enable_profiling", True)]
    assert cfg.declare("new.param", 7) == 7
    assert cfg.get("new.param") == 7


def test_stage_timer_and_log(tmp_path):
    t = StageTimer()
    x = jnp.arange(10.0)
    t.lap("filter", x)
    t.lap("project")
    assert set(t.laps) == {"filter", "project"}
    log = StageLog(str(tmp_path / "prof.csv"), log_size=2)
    log.add(t.laps)
    log.add(t.laps)  # triggers flush
    lines = open(tmp_path / "prof.csv").read().strip().split("\n")
    assert lines[0].startswith("loop,callback,filter")
    assert len(lines) == 3


def test_fps_counter():
    c = FpsCounter(report_every_s=0.0)
    msg = c.tick()
    assert msg is not None and "FPS" in msg


def test_device_feeder_source_error_ends_stream():
    class BoomSource(SyntheticSource):
        def next_frame(self):
            if self.frame_idx >= 2:
                raise RuntimeError("camera unplugged")
            return super().next_frame()

    scene = SyntheticScene()
    wl, wr = two_camera_rig()
    left = BoomSource(scene, small_intr(), wl, seed=1)
    right = SyntheticSource(scene, small_intr(), wr, seed=2)
    import pytest

    with DeviceFeeder(left, right) as feeder:
        seen = 0
        with pytest.raises(RuntimeError, match="producer failed"):
            for _ in feeder:
                seen += 1
    assert seen <= 2
    assert feeder.error is not None and "unplugged" in str(feeder.error)


def test_feeder_with_jittered_streams():
    """Jittered/unsynchronized sources still pair within the 17 ms gate."""
    scene = SyntheticScene()
    wl, wr = two_camera_rig()
    left = SyntheticSource(scene, small_intr(), wl, seed=1,
                           timestamp_jitter_s=0.004)
    right = SyntheticSource(scene, small_intr(), wr, seed=2,
                            timestamp_jitter_s=0.004, start_time=0.008)
    with DeviceFeeder(left, right) as feeder:
        pairs = []
        for pair in feeder:
            pairs.append(abs(pair.host_left.timestamp - pair.host_right.timestamp))
            if len(pairs) >= 10:
                break
    assert len(pairs) == 10
    assert max(pairs) <= 0.017 + 1e-9


def test_device_stamp_epoch_precision():
    """Epoch-scale stamps keep sub-ms precision on the f32 device copy
    (raw 1.7e9 seconds would quantize to >60 ms — coarser than the 17 ms
    pairing gate). Host stamps stay absolute f64."""
    import jax.numpy as jnp

    from pointcloud_depthfusion_tpu.core import frameset as FS
    from pointcloud_depthfusion_tpu.core.camera import Intrinsics
    from pointcloud_depthfusion_tpu.core.frameset import Frameset

    intr = Intrinsics.create(8, 6, fx=5.0, fy=5.0, ppx=4.0, ppy=3.0)
    depth = np.zeros((6, 8), np.uint16)
    color = np.zeros((6, 8, 3), np.uint8)
    t0 = 1.7e9 + 0.123456
    fs1 = Frameset.create(depth, color, intr, timestamp=t0)
    fs2 = Frameset.create(depth, color, intr, timestamp=t0 + 0.0042)
    diff = float(fs2.timestamp) - float(fs1.timestamp)
    assert abs(diff - 0.0042) < 1e-4, diff  # far finer than the 17 ms gate
    # absolute time recoverable on host
    assert abs(FS.absolute_stamp(float(fs1.timestamp), float(fs1.timestamp_epoch)) - t0) < 1e-3
    assert abs(fs1.to_host().timestamp - t0) < 1e-3


def test_stage_log_appends_across_flush_windows(tmp_path):
    """Multi-window logs must keep EVERY window (flush used mode 'w' and
    only the final window survived)."""
    from pointcloud_depthfusion_tpu.utils.profiling import StageLog

    p = str(tmp_path / "stages.csv")
    log = StageLog(p, fields=["a", "b"], log_size=2)
    for i in range(5):
        log.add({"a": float(i), "b": 0.0})
    log.flush()
    with open(p) as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0] == "a,b"
    assert len(lines) == 6  # header + all 5 rows
    assert [float(l.split(",")[0]) for l in lines[1:]] == [0, 1, 2, 3, 4]


def test_ply_color_round_trip(tmp_path, rng):
    from pointcloud_depthfusion_tpu.io.artifacts import load_ply, save_ply

    pts = rng.normal(size=(40, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (40, 3)).astype(np.uint8)
    for binary in (False, True):
        p = str(tmp_path / f"c_{binary}.ply")
        save_ply(p, pts, cols, binary=binary)
        xyz, rgb = load_ply(p, return_colors=True)
        np.testing.assert_allclose(xyz, pts, atol=1e-4)
        np.testing.assert_array_equal(rgb, cols)


def test_feeder_end_of_stream_repeat_get():
    """After the clean end-of-stream None, further get() calls must keep
    returning None instead of blocking on an empty queue forever."""
    from pointcloud_depthfusion_tpu.core.camera import Intrinsics
    from pointcloud_depthfusion_tpu.io.feeder import (
        DeviceFeeder,
        SyntheticSource,
    )
    from pointcloud_depthfusion_tpu.io.synthetic import (
        SyntheticScene,
        two_camera_rig,
    )

    class FiniteSource(SyntheticSource):
        def __init__(self, *a, limit=2, **kw):
            super().__init__(*a, **kw)
            self._limit = limit
            self._served = 0

        def next_frame(self):
            if self._served >= self._limit:
                return None
            self._served += 1
            return super().next_frame()

    intr = Intrinsics.create(32, 24, fx=28.0, fy=28.0, ppx=16.0, ppy=12.0)
    scene = SyntheticScene()
    wl, wr = two_camera_rig()
    feeder = DeviceFeeder(
        FiniteSource(scene, intr, wl, limit=2),
        FiniteSource(scene, intr, wr, limit=2),
    )
    seen = 0
    while True:
        pair = feeder.get(timeout=10.0)
        if pair is None:
            break
        seen += 1
    assert seen >= 1
    # Second and third end-of-stream reads: immediate None, no timeout needed.
    assert feeder.get() is None
    assert feeder.get() is None
    feeder.stop()


def test_ply_binary_nonleading_xyz_and_big_endian(tmp_path, rng):
    """The binary PLY parser reads each property at its declared offset,
    dtype, and byte order: x/y/z preceded by normals, double-typed
    coordinates, and big_endian files must all parse by NAME (like the
    ascii path), not as the first 12 bytes of each record."""
    from pointcloud_depthfusion_tpu.io.artifacts import load_ply

    n = 7
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)

    for fmt, endian in (("binary_little_endian", "<"),
                        ("binary_big_endian", ">")):
        p = str(tmp_path / f"{fmt}.ply")
        header = "\n".join([
            "ply",
            f"format {fmt} 1.0",
            f"element vertex {n}",
            "property float nx", "property float ny", "property float nz",
            "property double x", "property double y", "property double z",
            "property uchar red", "property uchar green",
            "property uchar blue",
            "end_header",
        ]) + "\n"
        rec = np.dtype([
            ("nx", endian + "f4"), ("ny", endian + "f4"),
            ("nz", endian + "f4"),
            ("x", endian + "f8"), ("y", endian + "f8"),
            ("z", endian + "f8"),
            ("red", "u1"), ("green", "u1"), ("blue", "u1"),
        ])
        arr = np.zeros(n, rec)
        arr["nx"], arr["ny"], arr["nz"] = nrm.T
        arr["x"], arr["y"], arr["z"] = pts.astype(np.float64).T
        arr["red"], arr["green"], arr["blue"] = cols.T
        with open(p, "wb") as fh:
            fh.write(header.encode("ascii"))
            fh.write(arr.tobytes())
        xyz, rgb = load_ply(p, return_colors=True)
        np.testing.assert_allclose(xyz, pts, rtol=1e-6)
        np.testing.assert_array_equal(rgb, cols)


def test_encoded_frameset_rejects_truncated_and_bad_magic():
    import pytest

    from pointcloud_depthfusion_tpu.io.encoded import EncodedFrameset
    from pointcloud_depthfusion_tpu.io.feeder import HostFrameset

    fs = HostFrameset(
        depth=np.full((4, 6), 123, np.uint16),
        color=np.zeros((4, 6, 3), np.uint8),
        timestamp=1.5,
        depth_scale=0.001,
    )
    blob = EncodedFrameset.encode(fs).to_bytes()
    # round trip still fine
    EncodedFrameset.from_bytes(blob).decode()
    with pytest.raises(ValueError, match="truncated"):
        EncodedFrameset.from_bytes(blob[:10])
    with pytest.raises(ValueError, match="truncated"):
        EncodedFrameset.from_bytes(blob[:-5])
    with pytest.raises(ValueError, match="magic|bad"):
        EncodedFrameset.from_bytes(b"XXXX" + blob[4:])


def test_approximate_time_sync_n():
    """N-way ApproximateTime gate: aligned sets emitted across 3 jittered
    streams; unmatchable frames age out without wedging the queues."""
    from pointcloud_depthfusion_tpu.io.feeder import ApproximateTimeSyncN

    def f(t):
        return HostFrameset(
            depth=np.zeros((2, 2), np.uint16),
            color=np.zeros((2, 2, 3), np.uint8),
            timestamp=t,
        )

    sync = ApproximateTimeSyncN(3, max_interval_s=0.017)
    got = []
    # 30 Hz cadence with per-stream jitter well inside the gate
    jit = [0.0, 0.004, -0.003]
    for k in range(7):
        t = k / 30.0
        for s in range(3):
            got += sync.push(s, f(t + jit[s]))
    # The newest set may be withheld until the NEXT frame proves no better
    # match is coming (streaming semantics) — 6 of 7 must be out.
    assert len(got) >= 6, len(got)
    for frames in got:
        stamps = [fr.timestamp for fr in frames]
        assert max(stamps) - min(stamps) <= 0.017

    # One stream silent: nothing emits, queues stay bounded.
    sync2 = ApproximateTimeSyncN(3, max_interval_s=0.017, queue_size=4)
    emitted = []
    for k in range(10):
        t = k / 30.0
        emitted += sync2.push(0, f(t))
        emitted += sync2.push(1, f(t))
    assert emitted == []
    assert all(len(q) <= 4 for q in sync2.queues)
    # Stream 2 wakes up at a much later time: old unmatchable frames are
    # dropped, matching resumes on fresh data.
    for k in range(10, 14):
        t = k / 30.0
        emitted += sync2.push(0, f(t))
        emitted += sync2.push(1, f(t))
        emitted += sync2.push(2, f(t))
    assert len(emitted) >= 2, len(emitted)
    assert sync2.dropped > 0


def test_approximate_time_sync_n_flush():
    """flush() relaxes the final-pick gate at end of stream: a complete
    within-interval set whose picks were each waiting on a (never-coming)
    next frame is emitted, not dropped — regression for the RigFeeder
    losing the last synchronized set of a finite recorded stream."""
    from pointcloud_depthfusion_tpu.io.feeder import ApproximateTimeSyncN

    def f(t):
        return HostFrameset(
            depth=np.zeros((2, 2), np.uint16),
            color=np.zeros((2, 2, 3), np.uint8),
            timestamp=t,
        )

    sync = ApproximateTimeSyncN(3, max_interval_s=0.017)
    # Streams 1 and 2 end on frames just EARLIER than stream 0's last
    # (each is its queue's newest and before the pivot → withheld).
    got = sync.push(0, f(1.000))
    got += sync.push(1, f(0.996))
    got += sync.push(2, f(0.995))
    assert got == []  # the streaming gate correctly waits
    flushed = sync.flush()
    assert len(flushed) == 1
    stamps = [fr.timestamp for fr in flushed[0]]
    assert max(stamps) - min(stamps) <= 0.017
    assert all(not q for q in sync.queues)

    # Unmatchable leftovers at stream end are discarded, never emitted
    # (the drop loop stops once some queue empties; any residue in the
    # other queues is unreachable and simply abandoned with the sync).
    sync2 = ApproximateTimeSyncN(2, max_interval_s=0.017)
    sync2.push(0, f(1.0))
    sync2.push(1, f(2.0))
    assert sync2.flush() == []


def test_package_lazy_exports():
    """Top-level lazy API: every advertised export resolves, and the bare
    package import stays free (no submodule/backend work)."""
    import importlib
    import sys

    import pointcloud_depthfusion_tpu as pdf

    for name in pdf.__all__:
        obj = getattr(pdf, name)
        assert getattr(obj, "__name__", name).endswith(name.split(".")[-1]) or obj
    import pytest

    with pytest.raises(AttributeError):
        pdf.does_not_exist
    # the conventional version probe must survive the lazy rewrite
    assert pdf.__version__ == "0.1.0"


def test_record_dataset_rejects_empty(tmp_path):
    import pytest

    with pytest.raises(ValueError, match="no frames"):
        record_dataset(str(tmp_path / "e.npz"), [], small_intr())


def test_recorded_legacy_scalar_scale(tmp_path):
    """Legacy recordings stored ONE depth_scale; the loader broadcasts it."""
    scene = SyntheticScene()
    wl, _ = two_camera_rig()
    src = SyntheticSource(scene, small_intr(), wl, fps=30.0)
    frames = [src.next_frame() for _ in range(3)]
    path = str(tmp_path / "legacy.npz")
    record_dataset(path, frames, small_intr())
    # rewrite the scale field in the legacy single-element form
    with np.load(path) as d:
        data = dict(d)
    data["depth_scale"] = np.asarray([0.0005], np.float64)
    np.savez_compressed(path, **data)
    rec = RecordedSource(path)
    assert all(
        rec.next_frame().depth_scale == 0.0005 for _ in range(3)
    )


def test_record_dataset_exact_path_no_suffix(tmp_path):
    """np.savez appends '.npz' to bare NAMES (the trap that once broke
    tpu_check's golden publish); record_dataset writes through a file
    handle so the recording lands at EXACTLY the requested path."""
    from pointcloud_depthfusion_tpu.core.camera import Intrinsics
    from pointcloud_depthfusion_tpu.core.frameset import HostFrameset
    from pointcloud_depthfusion_tpu.io.recorded import (
        RecordedSource,
        record_dataset,
    )

    intr = Intrinsics.create(8, 6, fx=5.0, fy=5.0, ppx=4.0, ppy=3.0)
    frames = [
        HostFrameset(depth=np.full((6, 8), 100 + i, np.uint16),
                     color=np.full((6, 8, 3), i, np.uint8),
                     timestamp=0.1 * i, depth_scale=0.001)
        for i in range(3)
    ]
    p = str(tmp_path / "run1")  # deliberately no .npz suffix
    record_dataset(p, frames, intr)
    assert os.path.exists(p) and not os.path.exists(p + ".npz")
    src = RecordedSource(p)
    f = src.next_frame()
    assert f is not None and int(f.depth[0, 0]) == 100
