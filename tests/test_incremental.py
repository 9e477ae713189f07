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


class TestRecenter:
    """GridMap.recenter — the grid_map circular-buffer move() analog."""

    def test_gridmap_recenter_geometry(self, terrain):
        from traversability_estimation_tpu.grid.gridmap import GridMap
        import jax.numpy as jnp

        z = terrain(64, 48, 0.1, seed=7, nan_frac=0.0)
        gm = GridMap.create((64, 48), 0.1, (1.0, -2.0), data={"elevation": z})
        # request an off-grid center: position snaps to the grid
        gm2 = gm.recenter((1.77, -2.33))
        np.testing.assert_allclose(np.asarray(gm2.position), [1.8, -2.3], atol=1e-6)
        # overlapping world positions keep their values
        x1, y1 = (np.asarray(a) for a in gm.cell_positions())
        x2, y2 = (np.asarray(a) for a in gm2.cell_positions())
        a1 = np.asarray(gm["elevation"])
        a2 = np.asarray(gm2["elevation"])
        # world point sampled from the overlap of both windows
        probe = np.array([1.31, -2.52], np.float32)
        i1 = tuple(np.asarray(gm.index_of(jnp.asarray(probe))))
        i2 = tuple(np.asarray(gm2.index_of(jnp.asarray(probe))))
        assert a1[i1] == a2[i2]
        # newly exposed strip is NaN; nothing else is
        exposed = np.isnan(a2)
        assert exposed.any() and not np.isnan(a1).any()
        # exposed cells are exactly those whose world position was outside
        # the old window
        half = np.array([64, 48]) * 0.1 / 2
        outside_old = (
            (x2 > 1.0 + half[0]) | (x2 <= 1.0 - half[0])
            | (y2 > -2.0 + half[1]) | (y2 <= -2.0 - half[1])
        )
        np.testing.assert_array_equal(exposed, outside_old)
        # zero-shift recenter is the identity
        gm3 = gm.recenter((1.0, -2.0))
        np.testing.assert_array_equal(np.asarray(gm3["elevation"]), a1)

    def test_roaming_recenter_matches_rebuild(self, terrain):
        """Bounded window roaming over a large world: recenter + merge +
        incremental refresh equals computing the final window from scratch
        (interior cells; the window edge halo differs by construction in
        both, identically)."""
        from traversability_estimation_tpu.parallel.sharding import required_halo

        res = 0.03
        world = terrain(320, 192, res, seed=17, nan_frac=0.03)
        wrows, wcols = world.shape
        whalf = np.array([wrows, wcols]) * res / 2

        def world_patch(center, ph, pw):
            """Sample the synthetic world at a robot-centric window."""
            i0 = int(np.floor((whalf[0] - (center[0] + ph * res / 2)) / res))
            j0 = int(np.floor((whalf[1] - (center[1] + pw * res / 2)) / res))
            out = np.full((ph, pw), np.nan, np.float32)
            si0, sj0 = max(i0, 0), max(j0, 0)
            si1, sj1 = min(i0 + ph, wrows), min(j0 + pw, wcols)
            out[si0 - i0 : si1 - i0, sj0 - j0 : sj1 - j0] = world[si0:si1, sj0:sj1]
            return out

        cfg = EstimatorConfig(resolution=res)
        est = TraversabilityEstimator(cfg)
        rows = cols = 96  # bounded window
        est.set_elevation_map(np.full((rows, cols), np.nan, np.float32), (0.0, 0.0))
        assert est.update()

        # roam east in steps; window follows the robot
        centers = [(0.0, 0.0), (0.9, 0.3), (1.8, 0.6), (2.7, 0.9)]
        for c in centers:
            assert est.recenter(c)
            patch = world_patch(np.asarray(est._position), 64, 64)
            assert est.update_with_submap(patch, tuple(est._position))
        assert np.asarray(est._elevation).shape == (rows, cols)

        # rebuild: fresh estimator on the final window's elevation
        ref = TraversabilityEstimator(cfg)
        final_elev = np.asarray(est._elevation)
        ref.set_elevation_map(final_elev, tuple(est._position))
        assert ref.update()

        halo = required_halo(cfg.chain, cfg.veto)
        # the merged 64x64 region around the final center, eroded by halo
        got = np.asarray(est.traversability_map["traversability"])
        want = np.asarray(ref.traversability_map["traversability"])
        i0 = rows // 2 - 32 + halo
        j0 = cols // 2 - 32 + halo
        sl = (slice(i0, i0 + 64 - 2 * halo), slice(j0, j0 + 64 - 2 * halo))
        g, w = got[sl], want[sl]
        assert (np.isfinite(g) == np.isfinite(w)).all()
        both = np.isfinite(g) & np.isfinite(w)
        np.testing.assert_allclose(g[both], w[both], atol=1e-6)
        mask_g = np.asarray(est.traversability_map["traversable_mask"])[sl]
        mask_w = np.asarray(ref.traversability_map["traversable_mask"])[sl]
        np.testing.assert_array_equal(mask_g, mask_w)


def test_update_with_submap_sync_false_equivalent(terrain):
    # sync=False only skips the trailing block_until_ready (the config-5
    # pipelining lever, PROF_BIGMAP.json) — resulting layers must be
    # identical to the synchronous path.
    import copy

    from traversability_estimation_tpu.models import TraversabilityEstimator
    from traversability_estimation_tpu.utils.config import EstimatorConfig

    cfg = EstimatorConfig(resolution=0.05)
    base = terrain(120, 120, 0.05, seed=77, nan_frac=0.02)
    a = TraversabilityEstimator(cfg)
    b = TraversabilityEstimator(copy.deepcopy(cfg))
    assert a.update(base) and b.update(base)
    rng = np.random.default_rng(3)
    patch = (0.06 * rng.standard_normal((30, 30))).astype(np.float32)
    assert a.update_with_submap(patch, (0.4, -0.3), sync=True)
    assert b.update_with_submap(patch, (0.4, -0.3), sync=False)
    for name in a.traversability_map.layers:
        np.testing.assert_array_equal(
            np.asarray(a.traversability_map[name]),
            np.asarray(b.traversability_map[name]),
            err_msg=name,
        )
