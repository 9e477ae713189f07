"""Elevation-map ingest validation parity tests.

TraversabilityMap::setElevationMap rejects frame-id mismatches and missing
required layers (TraversabilityMap.cpp:135-154, layer sets from createLayers
:64-77); loadElevationMap instead pads missing layers with zeros
(TraversabilityEstimation.cpp:331-362). Raw-map mode swaps the required set.
"""

import dataclasses

import numpy as np
import pytest

from tests.conftest import synthetic_terrain
from traversability_estimation_tpu.models import TraversabilityEstimator
from traversability_estimation_tpu.utils.config import EstimatorConfig
from traversability_estimation_tpu.utils.rosbag import GridMapMessage

RES = 0.03


def _msg(data, frame="map", pos=(0.0, 0.0)):
    first = next(iter(data.values()))
    r, c = first.shape
    return GridMapMessage(
        frame_id=frame,
        resolution=RES,
        length=(r * RES, c * RES),
        position=(pos[0], pos[1], 0.0),
        orientation=(0, 0, 0, 1),
        layers=list(data),
        basic_layers=[],
        data=data,
    )


@pytest.fixture
def elev():
    return synthetic_terrain(24, 24, RES, seed=1)


@pytest.mark.slow
def test_msg_ingest_requires_fused_layers(elev):
    est = TraversabilityEstimator(EstimatorConfig(resolution=RES))
    # missing upper/lower_bound -> rejected (fused layer set)
    assert not est.set_elevation_map_msg(_msg({"elevation": elev}))
    full = {
        "elevation": elev,
        "upper_bound": elev + 0.01,
        "lower_bound": elev - 0.01,
    }
    assert est.set_elevation_map_msg(_msg(full))
    assert est.update()
    # uncertainty_range derived on update (publish parity)
    ur = np.asarray(est.traversability_map["uncertainty_range"])
    np.testing.assert_allclose(
        ur, np.asarray(full["upper_bound"]) - np.asarray(full["lower_bound"]),
        atol=1e-6, equal_nan=True,
    )


def test_msg_ingest_rejects_wrong_frame(elev):
    est = TraversabilityEstimator(EstimatorConfig(resolution=RES))
    data = {
        "elevation": elev,
        "upper_bound": elev,
        "lower_bound": elev,
    }
    assert not est.set_elevation_map_msg(_msg(data, frame="odom"))
    assert est.set_elevation_map_msg(_msg(data, frame="map"))


def test_raw_map_mode_layer_set(elev):
    cfg = EstimatorConfig(resolution=RES, use_raw_map=True)
    est = TraversabilityEstimator(cfg)
    fused = {"elevation": elev, "upper_bound": elev, "lower_bound": elev}
    assert not est.set_elevation_map_msg(_msg(fused))  # raw set required
    raw = {
        "elevation": elev,
        "variance": np.abs(elev) * 0.01,
        "horizontal_variance_x": np.full_like(elev, 0.001),
        "horizontal_variance_y": np.full_like(elev, 0.001),
        "horizontal_variance_xy": np.zeros_like(elev),
        "time": np.zeros_like(elev),
    }
    assert est.set_elevation_map_msg(_msg(raw))
    assert est.update()
    assert "variance" in est.traversability_map.layers


def test_initialize_pads_missing_layers(elev):
    est = TraversabilityEstimator(EstimatorConfig(resolution=RES))
    # bare elevation is enough through the lenient load path
    assert est.initialize_from_grid_map_msg(_msg({"elevation": elev}))
    assert est.update()
    ub = np.asarray(est.traversability_map["upper_bound"])
    np.testing.assert_array_equal(ub, 0.0)  # padded with zeros (cpp:340-345)
