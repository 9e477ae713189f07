"""Incremental submap updates + query-crop fields: identical to full paths."""

import numpy as np
import pytest

from traversability_estimation_tpu.models import TraversabilityEstimator
from traversability_estimation_tpu.utils.config import EstimatorConfig


@pytest.fixture
def world(terrain):
    return terrain(192, 192, 0.03, seed=91, nan_frac=0.04)


@pytest.mark.slow
def test_incremental_update_matches_full(world, terrain):
    est_inc = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    est_full = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    assert est_inc.update(world)
    assert est_full.update(world)

    patch = terrain(40, 40, 0.03, seed=92, nan_frac=0.02) + 0.1
    center = (0.3, -0.4)
    assert est_inc.update_with_submap(patch, center, incremental=True)
    assert est_full.update_with_submap(patch, center, incremental=False)

    for layer in (
        "traversability",
        "traversability_slope",
        "traversability_step",
        "traversable_mask",
    ):
        a = np.asarray(est_inc.traversability_map[layer])
        b = np.asarray(est_full.traversability_map[layer])
        if a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=layer)
        else:
            assert (np.isfinite(a) == np.isfinite(b)).all(), layer
            both = np.isfinite(a) & np.isfinite(b)
            np.testing.assert_allclose(a[both], b[both], atol=1e-6, err_msg=layer)


@pytest.mark.slow
def test_incremental_at_map_edge(world, terrain):
    est_inc = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    est_full = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    est_inc.update(world)
    est_full.update(world)
    patch = terrain(40, 40, 0.03, seed=93, nan_frac=0.0)
    center = (2.7, 2.7)  # partially off-map corner
    assert est_inc.update_with_submap(patch, center, incremental=True)
    assert est_full.update_with_submap(patch, center, incremental=False)
    a = np.asarray(est_inc.traversability_map["traversable_mask"])
    b = np.asarray(est_full.traversability_map["traversable_mask"])
    np.testing.assert_array_equal(a, b)


def test_cropped_queries_match_full(world, rng):
    est = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    est.update(world)
    P, N = 48, 5
    starts = np.stack([rng.uniform(-1.5, 1.5, P), rng.uniform(-1.5, 1.5, P)], -1)
    steps = rng.uniform(-0.15, 0.15, (P, N - 1, 2))
    poses = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    ).astype(np.float32)
    n_poses = rng.integers(1, N + 1, size=P).astype(np.int32)

    safe_c, trav_c = est.check_circular_paths_batch(poses, n_poses, 0.25, crop=True)
    safe_f, trav_f = est.check_circular_paths_batch(poses, n_poses, 0.25, crop=False)
    np.testing.assert_array_equal(np.asarray(safe_c), np.asarray(safe_f))
    np.testing.assert_allclose(
        np.asarray(trav_c), np.asarray(trav_f), atol=2e-5
    )


def test_cropped_queries_partially_offmap(world, rng):
    est = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    est.update(world)
    # paths straddling the map edge
    poses = np.array(
        [
            [[2.7, 0.0], [3.2, 0.0], [3.6, 0.0]],  # walks off the east edge
            [[-5.0, -5.0], [-5.2, -5.0], [-5.4, -5.0]],  # fully off-map
        ],
        np.float32,
    )
    n_poses = np.array([3, 3], np.int32)
    safe_c, trav_c = est.check_circular_paths_batch(poses, n_poses, 0.25, crop=True)
    safe_f, trav_f = est.check_circular_paths_batch(poses, n_poses, 0.25, crop=False)
    np.testing.assert_array_equal(np.asarray(safe_c), np.asarray(safe_f))
    np.testing.assert_allclose(np.asarray(trav_c), np.asarray(trav_f), atol=2e-5)
