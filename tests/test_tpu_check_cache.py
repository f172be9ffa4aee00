"""Regression tests for the parity gate's golden-npz cache plumbing
(tpu_check.py): the atomic publish must actually land the file at the
fingerprint-keyed path (np.savez appends ``.npz`` to temp names — the
round-4 bug left the goldens stranded at ``*.npz.tmp.npz`` and crashed
the gate after the full multi-minute golden compute)."""

import os

import numpy as np

import tpu_check


def test_oracle_main_atomic_publish(tmp_path, monkeypatch):
    """_oracle_main writes the npz at EXACTLY the requested path (no
    stranded temp file) and the result round-trips through np.load."""
    golden = {"fuse_tiled_img": np.zeros((4, 4, 3), np.uint8),
              "gicp_fitness": np.float32(0.5)}
    monkeypatch.setattr(tpu_check, "compute_results", lambda w, h: golden)
    path = str(tmp_path / "goldens_848x480.npz")
    tpu_check._oracle_main(path, 848, 480)
    assert os.path.exists(path), "atomic publish missed the target path"
    leftovers = [p for p in os.listdir(tmp_path) if p != os.path.basename(path)]
    assert leftovers == [], f"stranded temp files: {leftovers}"
    loaded = dict(np.load(path))
    assert set(loaded) == set(golden)
    np.testing.assert_array_equal(loaded["fuse_tiled_img"],
                                  golden["fuse_tiled_img"])


def test_source_fingerprint_tracks_package_edits(tmp_path, monkeypatch):
    """The cache key must change when any package source changes (mtime or
    size), so stale goldens can never mask a regression."""
    fp1 = tpu_check._source_fingerprint()
    fp2 = tpu_check._source_fingerprint()
    assert fp1 == fp2, "fingerprint must be deterministic between calls"

    # Point the fingerprint at a synthetic tree and mutate one file.
    pkg = tmp_path / "pointcloud_depthfusion_tpu"
    pkg.mkdir()
    (pkg / "a.py").write_text("x = 1\n")
    gate = tmp_path / "tpu_check.py"
    gate.write_text("# gate\n")
    (tmp_path / "__graft_entry__.py").write_text("# entry\n")
    monkeypatch.setattr(tpu_check.os.path, "abspath", lambda p: str(gate))
    base = tpu_check._source_fingerprint()
    (pkg / "a.py").write_text("x = 2  # size change\n")
    assert tpu_check._source_fingerprint() != base
