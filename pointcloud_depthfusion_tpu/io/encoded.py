"""Encoded (compressed) frameset containers.

Equivalent of the reference's declared-but-unused EncodedImage /
EncodedFrameset messages (camera_interfaces/msg/Encoded*.msg): a compact
wire/storage format for a synchronized frame pair — PNG-compressed color
(rgb8) and 16-bit-PNG depth plus the timestamp/scale metadata — useful for
low-bandwidth links and compact recordings.
"""

from __future__ import annotations

import dataclasses
import io as _io
import struct
from typing import List

import numpy as np

from pointcloud_depthfusion_tpu.core.frameset import HostFrameset

_MAGIC = b"PDFE"
_VERSION = 1


@dataclasses.dataclass
class EncodedFrameset:
    """One compressed depth+color pair."""

    depth_png: bytes
    color_png: bytes
    timestamp: float
    depth_scale: float

    @staticmethod
    def encode(fs: HostFrameset) -> "EncodedFrameset":
        from PIL import Image  # noqa: PLC0415

        cbuf = _io.BytesIO()
        Image.fromarray(fs.color).save(cbuf, format="PNG", optimize=False)
        dbuf = _io.BytesIO()
        # No explicit mode: Pillow infers I;16 from the uint16 dtype (the
        # mode= argument is deprecated and slated for removal in Pillow 13).
        Image.fromarray(fs.depth).save(dbuf, format="PNG")
        return EncodedFrameset(
            depth_png=dbuf.getvalue(),
            color_png=cbuf.getvalue(),
            timestamp=fs.timestamp,
            depth_scale=fs.depth_scale,
        )

    def decode(self) -> HostFrameset:
        from PIL import Image  # noqa: PLC0415

        color = np.asarray(Image.open(_io.BytesIO(self.color_png)))
        depth = np.asarray(Image.open(_io.BytesIO(self.depth_png)))
        if depth.dtype == np.int32:
            depth = depth.astype(np.uint16)
        return HostFrameset(
            depth=depth,
            color=color,
            timestamp=self.timestamp,
            depth_scale=self.depth_scale,
        )

    def to_bytes(self) -> bytes:
        header = struct.pack(
            "<4sBddII",
            _MAGIC,
            _VERSION,
            self.timestamp,
            self.depth_scale,
            len(self.depth_png),
            len(self.color_png),
        )
        return header + self.depth_png + self.color_png

    @staticmethod
    def from_bytes(data: bytes) -> "EncodedFrameset":
        # Wire data from untrusted/desynced peers: explicit ValueErrors
        # (never assert — gone under ``python -O``) and bounds checks, so a
        # truncated blob fails HERE with a framing diagnostic rather than
        # as an opaque PIL error on a silently short PNG slice.
        hdr_size = struct.calcsize("<4sBddII")
        if len(data) < hdr_size:
            raise ValueError(
                f"encoded frameset truncated: {len(data)} bytes < "
                f"{hdr_size}-byte header"
            )
        magic, version, ts, scale, dlen, clen = struct.unpack(
            "<4sBddII", data[:hdr_size]
        )
        if magic != _MAGIC or version != _VERSION:
            raise ValueError(
                f"bad encoded frameset (magic {magic!r}, version {version})"
            )
        if hdr_size + dlen + clen > len(data):
            raise ValueError(
                f"encoded frameset truncated: header claims {dlen}+{clen} "
                f"payload bytes, got {len(data) - hdr_size}"
            )
        depth_png = data[hdr_size : hdr_size + dlen]
        color_png = data[hdr_size + dlen : hdr_size + dlen + clen]
        return EncodedFrameset(
            depth_png=depth_png, color_png=color_png,
            timestamp=ts, depth_scale=scale,
        )


def write_encoded_stream(path: str, frames: List[HostFrameset]) -> None:
    """Append-framed container: [u32 length][EncodedFrameset bytes]..."""
    with open(path, "wb") as fh:
        for fs in frames:
            blob = EncodedFrameset.encode(fs).to_bytes()
            fh.write(struct.pack("<I", len(blob)))
            fh.write(blob)


def read_encoded_stream(path: str) -> List[HostFrameset]:
    out: List[HostFrameset] = []
    with open(path, "rb") as fh:
        while True:
            len_bytes = fh.read(4)
            if len(len_bytes) < 4:
                break
            (n,) = struct.unpack("<I", len_bytes)
            out.append(EncodedFrameset.from_bytes(fh.read(n)).decode())
    return out
