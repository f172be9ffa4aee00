"""Native runtime bindings (ctypes over runtime/libpdf_runtime.so).

Builds on demand with ``make -C runtime`` (g++ + OpenMP). Every consumer
falls back to the pure-Python implementation when the library is missing,
so the framework stays importable on build-less hosts.
"""

from pointcloud_depthfusion_tpu.runtime.bindings import (  # noqa: F401
    NativePairer,
    NativeRing,
    decimation_filter_native,
    has_native_filters,
    is_available,
    load_library,
    render_scene_native,
    spatial_filter_native,
)
