"""Test configuration: run everything on a virtual 8-device CPU mesh.

TPU hardware is single-chip in CI; multi-chip sharding is validated on a
virtual CPU mesh (see SURVEY.md §7 and the driver's dryrun_multichip hook).
Must set flags before jax is imported anywhere.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (remote TPU
# tunnel) and the axon sitecustomize force-sets jax_platforms="axon,cpu" at
# interpreter start; running unit tests op-by-op over that link is orders of
# magnitude slower and single-device. Benchmarks (bench.py) use the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Must come AFTER import: sitecustomize may already have set "axon,cpu".
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # oracles compare at f64; ops pick dtypes
assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent XLA cache: the heavy suite compiles (GICP planar GN loop,
# shard_map SPMD programs — minutes on this 1-core host) become a
# once-per-container cost; the cache key is the optimized HLO, so code
# changes re-compile exactly what changed. Separate dir from the TPU cache.
from pointcloud_depthfusion_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache(
    os.path.join(os.path.expanduser("~"), ".cache", "pdf_cpu_test_xla")
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
