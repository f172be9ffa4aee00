"""ctypes bindings for the native host runtime (runtime/pdf_runtime.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_LIB_PATH = os.path.join(_REPO_ROOT, "runtime", "libpdf_runtime.so")

_lib: Optional[ctypes.CDLL] = None
_lib_failed = False  # don't re-run `make` per call after a failed build
_lib_lock = threading.Lock()


def load_library(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native runtime library."""
    global _lib, _lib_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _lib_failed:
            return None
        src = os.path.join(_REPO_ROOT, "runtime", "pdf_runtime.cpp")
        stale = (
            os.path.exists(_LIB_PATH)
            and os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if (not os.path.exists(_LIB_PATH) or stale) and build_if_missing:
            try:
                subprocess.run(
                    ["make", "-C", os.path.join(_REPO_ROOT, "runtime"),
                     "-B" if stale else "all"],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except subprocess.CalledProcessError as exc:
                if stale:
                    # NEVER silently load an outdated binary over newer
                    # sources — parity tests would "verify" the wrong code.
                    raise RuntimeError(
                        "native runtime rebuild failed for a stale "
                        f"libpdf_runtime.so:\n{exc.stderr.decode(errors='replace')}"
                    ) from exc
                _lib_failed = True
                return None
            except Exception:
                if stale or not os.path.exists(_LIB_PATH):
                    _lib_failed = True
                    return None
        elif stale:
            # build_if_missing=False with a STALE binary on disk: refuse to
            # load it rather than silently "verify" outdated native code —
            # the same invariant the rebuild path enforces. Not latched:
            # a later default call rebuilds and succeeds.
            return None
        if not os.path.exists(_LIB_PATH):
            # Only latch the failure when a build was actually ATTEMPTED: a
            # build_if_missing=False probe must not permanently disable
            # later default calls that would have built the library.
            if build_if_missing:
                _lib_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)

        lib.pdf_render_scene.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.pdf_render_scene.restype = None

        lib.pdf_pairer_create.argtypes = [ctypes.c_double, ctypes.c_int]
        lib.pdf_pairer_create.restype = ctypes.c_void_p
        lib.pdf_pairer_destroy.argtypes = [ctypes.c_void_p]
        lib.pdf_pairer_push.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.pdf_pairer_push.restype = ctypes.c_int
        lib.pdf_pairer_dropped.argtypes = [ctypes.c_void_p]
        lib.pdf_pairer_dropped.restype = ctypes.c_int64
        lib.pdf_pairer_emitted.argtypes = [ctypes.c_void_p]
        lib.pdf_pairer_emitted.restype = ctypes.c_int64

        lib.pdf_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.pdf_ring_create.restype = ctypes.c_void_p
        lib.pdf_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.pdf_ring_acquire_write.argtypes = [ctypes.c_void_p]
        lib.pdf_ring_acquire_write.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.pdf_ring_commit_write.argtypes = [ctypes.c_void_p]
        lib.pdf_ring_acquire_read.argtypes = [ctypes.c_void_p]
        lib.pdf_ring_acquire_read.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.pdf_ring_commit_read.argtypes = [ctypes.c_void_p]
        lib.pdf_ring_size.argtypes = [ctypes.c_void_p]
        lib.pdf_ring_size.restype = ctypes.c_size_t

        for fn, elem in (
            ("pdf_spatial_filter_u16", ctypes.c_uint16),
            ("pdf_spatial_filter_f32", ctypes.c_float),
        ):
            if hasattr(lib, fn):
                getattr(lib, fn).argtypes = [
                    ctypes.POINTER(elem), ctypes.c_int, ctypes.c_int,
                    ctypes.c_float, ctypes.c_float, ctypes.c_int,
                    ctypes.c_int,
                ]
                getattr(lib, fn).restype = None
        if hasattr(lib, "pdf_decimation_u16"):
            lib.pdf_decimation_u16.argtypes = [
                ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.pdf_decimation_u16.restype = None

        _lib = lib
        return _lib


def is_available() -> bool:
    return load_library() is not None


def render_scene_native(
    width: int,
    height: int,
    fx: float,
    fy: float,
    ppx: float,
    ppy: float,
    world_from_cam: np.ndarray,
    plane_z: float,
    spheres: np.ndarray,  # (N, 7): cx cy cz r  cr cg cb
    checker_period: float,
    max_depth: float,
    depth_scale: float,
    noise_std: float = 0.0,
    hole_fraction: float = 0.0,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """OpenMP-parallel scene render; returns (depth u16 (H,W), color u8 (H,W,3))."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native runtime not available")
    depth = np.empty((height, width), np.uint16)
    color = np.empty((height, width, 3), np.uint8)
    wfc = np.ascontiguousarray(world_from_cam, np.float64).reshape(16)
    sph = np.ascontiguousarray(spheres, np.float64).reshape(-1)
    n_spheres = len(sph) // 7
    lib.pdf_render_scene(
        width, height, fx, fy, ppx, ppy,
        wfc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        plane_z, n_spheres,
        sph.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        checker_period, max_depth, depth_scale,
        noise_std, hole_fraction, seed,
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        color.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return depth, color


def has_native_filters() -> bool:
    lib = load_library()
    return lib is not None and hasattr(lib, "pdf_spatial_filter_u16")


def spatial_filter_native(
    depth: np.ndarray, alpha: float = 0.55, delta: float = 20.0,
    magnitude: int = 2, holes_fill: int = 0,
) -> np.ndarray:
    """OpenMP rs2 spatial filter — value-identical to
    ops.host_filters.spatial_filter_np (built with -ffp-contract=off so the
    f32 blends round the same) at ~60× the throughput (the numpy recursion
    costs ~130 ms/frame at 848×480, far over the 33 ms capture budget)."""
    lib = load_library()
    if lib is None or not has_native_filters():
        raise RuntimeError("native runtime (with filters) not available")
    h, w = depth.shape
    if np.issubdtype(depth.dtype, np.integer):
        # Clip (not modulo-wrap) into the u16 domain and hand back the
        # INPUT dtype — exactly what _spatial_filter_numpy does, so the
        # auto-dispatch in ops.host_filters is value- and dtype-identical
        # whether or not the native toolchain is present.
        out = np.ascontiguousarray(np.clip(depth, 0, 65535), np.uint16)
        lib.pdf_spatial_filter_u16(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            h, w, alpha, delta, int(magnitude), int(holes_fill),
        )
        return out.astype(depth.dtype, copy=False)
    out = np.ascontiguousarray(depth, np.float32).copy()
    lib.pdf_spatial_filter_f32(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, alpha, delta, int(magnitude), int(holes_fill),
    )
    return out


def decimation_filter_native(depth_u16: np.ndarray, magnitude: int = 2) -> np.ndarray:
    """Native rs2 decimation (block upper-median of nonzero depths)."""
    lib = load_library()
    if lib is None or not has_native_filters():
        raise RuntimeError("native runtime (with filters) not available")
    h, w = depth_u16.shape
    m = int(magnitude)
    if h % m or w % m:
        raise ValueError(f"image {h}x{w} not divisible by magnitude {m}")
    src = np.ascontiguousarray(depth_u16, np.uint16)
    out = np.empty((h // m, w // m), np.uint16)
    lib.pdf_decimation_u16(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        h, w, m,
    )
    return out


class NativePairer:
    """C++ ApproximateTime pairer (same semantics as io.feeder's Python one)."""

    def __init__(self, max_interval_s: float = 0.017, queue_size: int = 10):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native runtime not available")
        self._lib = lib
        self._h = lib.pdf_pairer_create(max_interval_s, queue_size)
        self._out = (ctypes.c_int64 * 64)()

    def push(self, stream: int, timestamp: float, frame_id: int) -> List[Tuple[int, int]]:
        n = self._lib.pdf_pairer_push(
            self._h, stream, timestamp, frame_id, self._out, 32
        )
        return [(self._out[i * 2], self._out[i * 2 + 1]) for i in range(n)]

    @property
    def dropped(self) -> int:
        return self._lib.pdf_pairer_dropped(self._h)

    @property
    def emitted(self) -> int:
        return self._lib.pdf_pairer_emitted(self._h)

    def __del__(self):
        try:
            self._lib.pdf_pairer_destroy(self._h)
        except Exception:
            pass


class NativeRing:
    """SPSC byte ring with numpy views over the slots (zero-copy hand-off)."""

    def __init__(self, slot_size: int, n_slots: int):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native runtime not available")
        self._lib = lib
        self.slot_size = slot_size
        self._h = lib.pdf_ring_create(slot_size, n_slots)

    def try_write(self, data: np.ndarray) -> bool:
        flat = np.asarray(data).reshape(-1).view(np.uint8)
        # Validate BEFORE acquiring: an oversized payload raising mid-copy
        # would leave the slot acquired but never committed; an undersized
        # one would hand the reader the previous frame's tail bytes.
        if flat.size > self.slot_size:
            raise ValueError(
                f"payload {flat.size} B exceeds ring slot {self.slot_size} B"
            )
        ptr = self._lib.pdf_ring_acquire_write(self._h)
        if not ptr:
            return False
        buf = np.ctypeslib.as_array(ptr, shape=(self.slot_size,))
        buf[: flat.size] = flat
        if flat.size < self.slot_size:
            buf[flat.size:] = 0
        self._lib.pdf_ring_commit_write(self._h)
        return True

    def try_read(self) -> Optional[np.ndarray]:
        ptr = self._lib.pdf_ring_acquire_read(self._h)
        if not ptr:
            return None
        buf = np.ctypeslib.as_array(ptr, shape=(self.slot_size,)).copy()
        self._lib.pdf_ring_commit_read(self._h)
        return buf

    def __len__(self) -> int:
        return self._lib.pdf_ring_size(self._h)

    def __del__(self):
        try:
            self._lib.pdf_ring_destroy(self._h)
        except Exception:
            pass
