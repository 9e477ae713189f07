"""Visualization export tests — the grid_map_visualization analog.

The reference's viz node maps traversability layers to occupancy grids and
elevation to a point cloud via config/visualization/traversability.yaml;
these tests pin our occupancy mapping (inverted range, NaN -> -1), point
cloud geometry, and the YAML-driven runner on the reference's shipped file.
"""

import os

import numpy as np
import pytest

from traversability_estimation_tpu.utils import viz

REF_VIZ_YAML = (
    "/root/reference/traversability_estimation/config/visualization/traversability.yaml"
)


def test_occupancy_grid_inverted_range():
    layer = np.array([[1.0, 0.0], [0.5, np.nan]], np.float32)
    # shipped config: data_min=1.0, data_max=0.0 -> traversable=free
    grid = viz.occupancy_grid(layer, 1.0, 0.0)
    assert grid.dtype == np.int8
    assert grid[0, 0] == 0  # fully traversable -> free
    assert grid[0, 1] == 100  # blocked -> occupied
    assert grid[1, 0] == 50
    assert grid[1, 1] == -1  # unknown


def test_occupancy_grid_clamps():
    layer = np.array([[-0.5, 1.5]], np.float32)
    grid = viz.occupancy_grid(layer, 0.0, 1.0)
    assert grid[0, 0] == 0 and grid[0, 1] == 100


def test_point_cloud_geometry():
    res = 0.1
    z = np.full((4, 4), np.nan, np.float32)
    z[0, 0] = 1.25  # max-x, max-y corner cell in grid_map convention
    z[3, 3] = -0.5
    pc = viz.point_cloud({"elevation": z, "c": np.ones_like(z)},
                         "elevation", res, (1.0, -2.0), extra_layers=("c",))
    assert len(pc) == 2
    p0 = pc[0]
    # cell (0,0) center: position + half - 0.5*res
    assert p0["x"] == pytest.approx(1.0 + 0.2 - 0.05)
    assert p0["y"] == pytest.approx(-2.0 + 0.2 - 0.05)
    assert p0["z"] == pytest.approx(1.25)
    assert p0["c"] == 1.0
    p1 = pc[1]
    assert p1["x"] == pytest.approx(1.0 - 0.2 + 0.05)
    assert p1["z"] == pytest.approx(-0.5)


def test_reference_yaml_runner():
    if not os.path.exists(REF_VIZ_YAML):
        pytest.skip("reference viz yaml not available")
    rng = np.random.default_rng(0)
    layers = {
        name: rng.random((8, 9)).astype(np.float32)
        for name in (
            "traversability",
            "traversability_slope",
            "traversability_step",
            "traversability_roughness",
            "elevation",
        )
    }
    out = viz.visualizations_from_yaml(REF_VIZ_YAML, layers, 0.03)
    assert set(out) == {
        "traversability_map", "slope_map", "step_map", "roughness_map",
        "traversability_cloud",
    }
    assert out["traversability_map"].dtype == np.int8
    assert out["traversability_cloud"].dtype.names == ("x", "y", "z")
    # absent layers are skipped, not an error
    out2 = viz.visualizations_from_yaml(REF_VIZ_YAML, {"elevation": layers["elevation"]}, 0.03)
    assert set(out2) == {"traversability_cloud"}


def test_chained_device_time_smoke():
    import jax.numpy as jnp

    from traversability_estimation_tpu.utils.profiling import chained_device_time

    t = chained_device_time(lambda a: a * 2.0 + 1.0, jnp.ones((64, 64)), iters=4)
    assert t >= 0.0
