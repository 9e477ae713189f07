"""End-to-end estimator: config load, update, queries, services, snapshots."""

import numpy as np
import pytest

from traversability_estimation_tpu.models import (
    FootprintPath,
    TraversabilityEstimator,
)
from traversability_estimation_tpu.utils.config import (
    EstimatorConfig,
    load_reference_config,
)


@pytest.fixture(scope="module")
def estimator(golden_map):
    cfg = load_reference_config(resolution=golden_map.resolution)
    est = TraversabilityEstimator(cfg)
    assert est.update(golden_map.data["elevation"], (0.0, 0.0))
    return est


def test_reference_config_roundtrip():
    cfg = load_reference_config()
    assert cfg.chain.slope_critical_value == 1.0
    assert cfg.chain.step_critical_value == 0.12
    assert cfg.chain.step_critical_cell_number == 4
    assert cfg.chain.normals_radius == 0.05
    assert cfg.footprint.circular_footprint_radius == 0.541
    assert cfg.footprint.traversability_default == 0.3
    assert cfg.max_gap_width == 0.3
    assert "traversability_slope" in cfg.chain.fusion_expression


def test_update_produces_layers(estimator, golden_map):
    m = estimator.traversability_map
    for layer in (
        "traversability",
        "traversability_slope",
        "traversability_step",
        "traversability_roughness",
        "step_footprint",
        "slope_footprint",
    ):
        assert layer in m.layers, layer
    # golden regression through the full estimator path
    ours = np.asarray(m["traversability"])
    g = golden_map.data["traversability"]
    assert (np.abs(ours - g) > 1e-3).sum() <= 2


def test_check_footprint_path_service(estimator):
    paths = [
        FootprintPath(poses=np.array([[0.0, 0.0]]), radius=0.3),
        FootprintPath(poses=np.array([[0.0, 0.0], [0.5, 0.2], [0.9, 0.4]]), radius=0.25),
        FootprintPath(
            poses=np.array([[0.0, 0.0], [0.4, 0.0]]),
            footprint=np.array([[0.2, 0.12], [0.2, -0.12], [-0.2, -0.12], [-0.2, 0.12]]),
        ),
        FootprintPath(poses=np.zeros((0, 2)), radius=0.3),  # empty -> unsafe
    ]
    results = estimator.check_footprint_path(paths)
    assert len(results) == 4
    assert all(0.0 <= r.traversability <= 1.0 for r in results)
    assert results[3].is_safe is False
    # polygonal result carries an area
    if results[2].is_safe:
        assert results[2].area > 0.0


def test_batched_path_api(estimator, rng):
    P, N = 64, 6
    starts = np.stack([rng.uniform(-1, 1, P), rng.uniform(-1.5, 1.5, P)], -1)
    steps = rng.uniform(-0.2, 0.2, (P, N - 1, 2))
    poses = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    ).astype(np.float32)
    n_poses = np.full((P,), N, np.int32)
    safe, trav = estimator.check_circular_paths_batch(poses, n_poses, 0.25)
    assert safe.shape == (P,)
    assert np.asarray(trav)[np.asarray(safe)].max() <= 1.0


@pytest.mark.slow
def test_traversability_footprint_services(estimator):
    m = estimator.traversability_footprint(0.7854)
    assert "traversability_x" in m.layers and "traversability_rot" in m.layers
    x = np.asarray(m["traversability_x"])
    assert np.isfinite(x).all() and x.min() >= 0.0 and x.max() <= 1.0
    m2 = estimator.traversability_footprint_circle()
    assert "traversability_footprint" in m2.layers


def test_save_load_roundtrip(estimator, tmp_path):
    p = str(tmp_path / "snapshot.npz")
    estimator.save(p)
    est2 = TraversabilityEstimator(estimator.config)
    assert est2.load_elevation_map(p)
    a = np.asarray(estimator.traversability_map["traversability"])
    b = np.asarray(est2.traversability_map["traversability"])
    np.testing.assert_array_equal(a, b)


def test_load_reference_bag(golden_map):
    est = TraversabilityEstimator(load_reference_config(golden_map.resolution))
    assert est.load_elevation_map(
        "/root/reference/traversability_estimation/maps/elevation_map.bag"
    )
    assert est.initialized


@pytest.mark.slow
def test_image_ingestion():
    est = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    img = np.linspace(0, 1, 32 * 32, dtype=np.float32).reshape(32, 32)
    assert est.set_elevation_from_image(img, 0.0, 0.5)
    assert est.update()
    assert est.initialized


def test_default_traversability_bounding(estimator):
    estimator.set_default_traversability(1.7)
    assert estimator._traversability_default == 1.0
    estimator.set_default_traversability(-0.5)
    assert estimator._traversability_default == 0.0
    estimator.set_default_traversability(0.3)


def test_map_has_valid_traversability_at(estimator):
    assert estimator.map_has_valid_traversability_at(0.0, 0.0)
    assert not estimator.map_has_valid_traversability_at(99.0, 99.0)
