"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding code (parallel/) is exercised on fake devices exactly as
recommended for TPU development; kernels themselves are numerics-checked vs
the NumPy oracle, so CPU execution is sufficient for correctness.
"""

import os

# Must be set before the CPU backend initializes. Note: this machine's
# sitecustomize force-registers the axon TPU platform and overrides
# JAX_PLATFORMS, so we also have to update jax.config directly.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: most test wall time is XLA:CPU compilation of
# shape-specialized kernels; caching makes repeat runs ~5x faster (first run
# in a fresh checkout still pays full compile cost).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

GOLDEN_ELEVATION_BAG = "/root/reference/traversability_estimation/maps/elevation_map.bag"
GOLDEN_TRAVERSABILITY_BAG = (
    "/root/reference/traversability_estimation/maps/traversability_map.bag"
)


@pytest.fixture(scope="session")
def golden_map():
    from traversability_estimation_tpu.utils.rosbag import load_grid_map_bag

    if not os.path.exists(GOLDEN_ELEVATION_BAG):
        pytest.skip("golden bags not available")
    return load_grid_map_bag(GOLDEN_ELEVATION_BAG)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def synthetic_terrain(rows, cols, resolution, seed=0, nan_frac=0.05):
    """Rough terrain with slopes, steps, and NaN holes for stress tests."""
    rng = np.random.default_rng(seed)
    x = np.arange(rows)[:, None] * resolution
    y = np.arange(cols)[None, :] * resolution
    z = (
        0.15 * np.sin(2.0 * x) * np.cos(1.5 * y)
        + 0.05 * rng.standard_normal((rows, cols))
        + 0.3 * ((x > x.mean()) & (y > y.mean()))  # a step edge
        + 0.1 * x  # a ramp
    )
    holes = rng.random((rows, cols)) < nan_frac
    z = np.where(holes, np.nan, z)
    return z.astype(np.float32)


@pytest.fixture
def terrain():
    return synthetic_terrain
