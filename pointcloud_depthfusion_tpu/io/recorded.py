"""Recorded frameset datasets: capture-to-disk and playback.

The reference streams live cameras only; for reproducible benchmarks and
offline runs this module records synchronized frameset streams into a single
``.npz`` (depth uint16, color uint8, timestamps, intrinsics) and plays them
back as a :class:`FramesetSource`.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from pointcloud_depthfusion_tpu.core.camera import Intrinsics
from pointcloud_depthfusion_tpu.core.frameset import HostFrameset
from pointcloud_depthfusion_tpu.io.feeder import FramesetSource


def record_dataset(path: str, frames: List[HostFrameset], intr: Intrinsics) -> None:
    if not frames:
        raise ValueError(
            "no frames captured — refusing to write an empty recording "
            f"to {path!r}"
        )
    # np.savez appends '.npz' to any NAME not already ending in it (the
    # same trap that once broke tpu_check's atomic golden publish) — so
    # write through an open file handle, which savez never renames: the
    # recording lands at exactly the path the caller asked for, where a
    # later RecordedSource(path) will look.
    with open(path, "wb") as fh:
        np.savez_compressed(
            fh,
            depth=np.stack([f.depth for f in frames]),
            color=np.stack([f.color for f in frames]),
            timestamps=np.asarray(
                [f.timestamp for f in frames], np.float64
            ),
            # PER-FRAME scales: the feeder/registration tiers honor each
            # HostFrameset's own depth_scale, so a recording must preserve
            # them (a single stored scalar would silently rescale any
            # frame whose sensor scale differed from frame 0's).
            depth_scale=np.asarray(
                [f.depth_scale for f in frames], np.float64
            ),
            intrinsics=np.asarray(
                [
                    intr.width,
                    intr.height,
                    float(intr.fx),
                    float(intr.fy),
                    float(intr.ppx),
                    float(intr.ppy),
                ],
                np.float64,
            ),
            coeffs=np.asarray(intr.coeffs, np.float64),
            model=np.asarray([int(intr.model)], np.int64),
        )


class RecordedSource(FramesetSource):
    """Plays back a recorded .npz dataset, optionally looping."""

    def __init__(self, path: str, loop: bool = False):
        # Context-managed: everything is materialized here, and an open
        # NpzFile otherwise pins its file descriptor for the object's
        # lifetime (N sources per rig replay, looped forever in the demo).
        with np.load(path) as data:
            self.depth = data["depth"]
            self.color = data["color"]
            self.timestamps = data["timestamps"]
            # Legacy recordings stored ONE scalar; current files store one
            # scale per frame. Broadcast the legacy form.
            scales = np.asarray(data["depth_scale"], np.float64).reshape(-1)
            if scales.shape[0] == len(self.timestamps):
                self.depth_scales = scales
            else:
                self.depth_scales = np.full(
                    len(self.timestamps), float(scales[0]), np.float64
                )
            w, h, fx, fy, ppx, ppy = data["intrinsics"]
            self._intr = Intrinsics.create(
                int(w), int(h), fx=fx, fy=fy, ppx=ppx, ppy=ppy,
                model=int(data["model"][0]), coeffs=tuple(data["coeffs"]),
            )
        self.depth_scale = float(self.depth_scales[0])
        self.loop = loop
        self.idx = 0
        self._loop_offset = 0.0
        if len(self.timestamps) > 1:
            self._period = float(np.median(np.diff(self.timestamps)))
        else:
            self._period = 1.0 / 30.0

    @property
    def intrinsics(self) -> Intrinsics:
        return self._intr

    @property
    def fps(self) -> float:
        """Median capture rate of the recording (Hz)."""
        return 1.0 / self._period if self._period > 0 else 30.0

    def __len__(self) -> int:
        return len(self.timestamps)

    def next_frame(self) -> Optional[HostFrameset]:
        if self.idx >= len(self.timestamps):
            if not self.loop:
                return None
            self._loop_offset += (
                self.timestamps[-1] - self.timestamps[0] + self._period
            )
            self.idx = 0
        i = self.idx
        self.idx += 1
        return HostFrameset(
            depth=self.depth[i],
            color=self.color[i],
            timestamp=float(self.timestamps[i]) + self._loop_offset,
            depth_scale=float(self.depth_scales[i]),
        )
