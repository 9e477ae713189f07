"""Untraversable-polygon parity: models/untraversable.py vs the oracle.

The reference returns the convex hull of the untraversable cells a failed
check actually visited (TraversabilityMap.cpp:634-642 polygonal,
:697-737 circle collection, :410-412 accumulation across circular paths).
The oracle in memoize=False mode is the referee (every sample computed
fresh — see oracle/footprint.py); the engine extracts the same cell sets
host-side from the dense veto-fail plane.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from traversability_estimation_tpu.models import untraversable
from traversability_estimation_tpu.oracle.footprint import OracleMap
from traversability_estimation_tpu.ops import footprint as fp_ops
from traversability_estimation_tpu.ops.veto import VetoConfig, compute_veto_fields_jit

RADIUS, OFFSET = 0.25, 0.15
DEFAULT = 0.5


@pytest.fixture(scope="module")
def setup(golden_map):
    m = golden_map
    layers = {
        k: m.data[k]
        for k in (
            "elevation",
            "traversability",
            "traversability_slope",
            "traversability_step",
            "traversability_roughness",
        )
    }
    cfg = VetoConfig(resolution=m.resolution, check_roughness=False)
    veto = compute_veto_fields_jit({k: jnp.asarray(v) for k, v in layers.items()}, cfg)
    fail_mask = ~np.asarray(veto["traversable_mask"])

    def fresh_oracle():
        return OracleMap(
            layers,
            m.resolution,
            (0.0, 0.0),
            critical_step_height=0.12,
            max_gap_width=0.3,
            traversability_default=DEFAULT,
            check_roughness=False,
            memoize=False,
        )

    return m, layers, fail_mask, fresh_oracle


def canonical(poly):
    """Order-independent vertex-set key for hull comparison."""
    v = np.asarray(poly, np.float64).round(9)
    return v[np.lexsort((v[:, 1], v[:, 0]))]


def assert_hulls_equal(got, want, label):
    if want is None or len(want) == 0:
        assert got is None or len(got) == 0, label
        return
    assert got is not None and len(got), label
    g, w = canonical(got), canonical(want)
    assert g.shape == w.shape, f"{label}: {g.shape} vs {w.shape}\n{g}\n{w}"
    np.testing.assert_allclose(g, w, atol=1e-9, err_msg=label)


class TestCircular:
    def test_paths_match_oracle(self, setup, rng):
        m, layers, fail_mask, fresh_oracle = setup
        P, N = 40, 3
        starts = np.stack(
            [rng.uniform(-1.0, 1.0, P), rng.uniform(-1.5, 1.5, P)], axis=-1
        )
        steps = rng.uniform(-0.35, 0.35, size=(P, N - 1, 2))
        poses = np.concatenate(
            [starts[:, None], starts[:, None] + np.cumsum(steps, axis=1)], axis=1
        ).astype(np.float64)
        n_poses = rng.integers(1, N + 1, size=P)

        n_failed = 0
        for p in range(P):
            pp = poses[p, : n_poses[p]]
            om = fresh_oracle()
            r = om.check_circular_footprint_path(
                pp, RADIUS, OFFSET, compute_untraversable=True
            )
            got = untraversable.circular_path_untraversable_polygon(
                fail_mask, m.resolution, (0.0, 0.0), pp, RADIUS, OFFSET, DEFAULT
            )
            if not r.is_safe:
                n_failed += 1
                assert_hulls_equal(got, r.untraversable_polygon, f"path {p}")
        # the golden map must actually exercise failures
        assert n_failed >= 5

    def test_single_pose_offmap_default_zero(self, setup):
        m, layers, fail_mask, fresh_oracle = setup
        pose = np.array([[50.0, 50.0]])
        got = untraversable.circular_path_untraversable_polygon(
            fail_mask, m.resolution, (0.0, 0.0), pose, RADIUS, OFFSET, 0.0
        )
        # off-map with default 0 -> the 20-gon circle outline
        # (TraversabilityMap.cpp:662-667)
        assert got is not None and len(got) == 20


class TestPolygonal:
    def _footprint(self):
        return np.array(
            [[0.2, 0.12], [0.2, -0.12], [-0.2, -0.12], [-0.2, 0.12]], np.float64
        )

    @pytest.mark.parametrize("conservative", [False, True])
    def test_paths_match_oracle(self, setup, rng, conservative):
        m, layers, fail_mask, fresh_oracle = setup
        fp = self._footprint()
        P, N = 32, 3
        starts = np.stack(
            [rng.uniform(-1.0, 1.0, P), rng.uniform(-1.5, 1.5, P)], axis=-1
        )
        steps = rng.uniform(-0.3, 0.3, size=(P, N - 1, 2))
        poses2 = np.concatenate(
            [starts[:, None], starts[:, None] + np.cumsum(steps, axis=1)], axis=1
        )
        pos3 = np.concatenate([poses2, np.zeros((P, N, 1))], axis=-1)
        yaws = rng.uniform(0, 2 * np.pi, size=(P, N))
        quats = np.zeros((P, N, 4))
        quats[..., 2] = np.sin(yaws / 2)
        quats[..., 3] = np.cos(yaws / 2)
        n_poses = rng.integers(1, N + 1, size=P)

        n_failed = 0
        for p in range(P):
            n = n_poses[p]
            om = fresh_oracle()
            r = om.check_polygonal_footprint_path(
                pos3[p, :n], quats[p, :n], fp, conservative=conservative,
                compute_untraversable=True,
            )
            got = untraversable.polygonal_path_untraversable_polygon(
                fail_mask, m.resolution, (0.0, 0.0), pos3[p, :n], quats[p, :n],
                fp, conservative,
            )
            if not r.is_safe:
                n_failed += 1
                assert_hulls_equal(got, r.untraversable_polygon, f"path {p}")
        assert n_failed >= 5


class TestPolygonStreams:
    """circular/polygonal_path_polygons — the publishPolygons side channel
    (TraversabilityMap.cpp:373-380,427-437,526-533,556-561)."""

    def test_circular_stream(self, setup, rng):
        m, layers, fail_mask, fresh_oracle = setup
        # a path guaranteed to fail: start at a failing cell
        ii, jj = np.nonzero(fail_mask)
        rows, cols = fail_mask.shape
        p0 = np.array([rows, cols]) * m.resolution / 2.0
        bad = p0 - (np.array([ii[len(ii) // 2], jj[len(jj) // 2]]) + 0.5) * m.resolution
        poses = np.stack([bad + [0.6, 0.0], bad + [0.3, 0.0], bad, bad - [0.3, 0.0]])
        fps, ups, z = untraversable.circular_path_polygons(
            fail_mask, m.resolution, (0.0, 0.0), poses, RADIUS, OFFSET, DEFAULT
        )
        # one 20-gon per evaluated segment, stopping at the failing one
        assert 1 <= len(fps) <= 3
        assert all(len(f) == 20 for f in fps)
        assert len(ups) >= 1
        # the final accumulated hull equals the result-polygon extraction
        want = untraversable.circular_path_untraversable_polygon(
            fail_mask, m.resolution, (0.0, 0.0), poses, RADIUS, OFFSET, DEFAULT
        )
        np.testing.assert_allclose(ups[-1], want)
        assert z == 0.0  # 2-D poses -> robot height 0

    def test_polygonal_stream_stops_at_failure(self, setup):
        m, layers, fail_mask, fresh_oracle = setup
        ii, jj = np.nonzero(fail_mask)
        rows, cols = fail_mask.shape
        p0 = np.array([rows, cols]) * m.resolution / 2.0
        bad = p0 - (np.array([ii[len(ii) // 2], jj[len(jj) // 2]]) + 0.5) * m.resolution
        poses = np.array(
            [[*(bad + [0.8, 0.0]), 0.4], [*(bad + [0.4, 0.0]), 0.4], [*bad, 0.4]]
        )
        fp = np.array([[0.1, 0.06], [0.1, -0.06], [-0.1, -0.06], [-0.1, 0.06]])
        fps, ups, z = untraversable.polygonal_path_polygons(
            fail_mask, m.resolution, (0.0, 0.0), poses, None, fp, False, DEFAULT
        )
        assert z == pytest.approx(0.4)  # mean pose z = robotHeight
        assert len(fps) >= 1
        # a safe segment never contributes an untraversable hull; the failing
        # segment ends the stream
        assert len(ups) <= 1
        if ups:
            assert len(fps) <= 2  # stopped at the failing segment


class TestNodePublication:
    def test_polygon_topics(self, setup):
        """footprint_polygon / untraversable_polygon channel parity: latched,
        published per checked path when subscribers exist."""
        from traversability_estimation_tpu.models.estimator import FootprintPath
        from traversability_estimation_tpu.node import TraversabilityNode
        from traversability_estimation_tpu.utils.config import load_reference_config

        m, layers, fail_mask, fresh_oracle = setup
        cfg = load_reference_config(resolution=m.resolution)
        node = TraversabilityNode(config=cfg)
        assert node.estimator.set_traversability_map(layers, (0.0, 0.0))

        got_fp, got_up = [], []
        node.subscribe_footprint_polygon(got_fp.append)
        node.subscribe_untraversable_polygon(got_up.append)

        ii, jj = np.nonzero(fail_mask)
        rows, cols = fail_mask.shape
        p0 = np.array([rows, cols]) * m.resolution / 2.0
        bad = p0 - (np.array([ii[len(ii) // 2], jj[len(jj) // 2]]) + 0.5) * m.resolution
        results = node.check_footprint_path(
            FootprintPath(
                poses=np.array([bad]), radius=0.2,
                compute_untraversable_polygon=True,
            )
        )
        assert not results[0].is_safe
        assert len(got_fp) == 1 and len(got_fp[0].vertices) == 20
        assert got_fp[0].z == 0.0 and got_fp[0].frame_id == "map"
        assert len(got_up) == 1
        # latched: a late subscriber immediately receives the last polygon
        late = []
        node.subscribe_untraversable_polygon(late.append)
        assert len(late) == 1
        np.testing.assert_array_equal(late[0].vertices, got_up[0].vertices)

        # without the compute flag, no untraversable publication (the
        # reference only fills the polygon when requested)
        node.check_footprint_path(FootprintPath(poses=np.array([bad]), radius=0.2))
        assert len(got_up) == 1
        assert len(got_fp) == 2


class TestEstimatorEndToEnd:
    def test_results_carry_polygons(self, setup):
        """check_footprint_path(compute_untraversable_polygon=True) end to
        end: failed paths return the module's hull, safe paths return None."""
        from traversability_estimation_tpu.models.estimator import (
            FootprintPath,
            TraversabilityEstimator,
        )
        from traversability_estimation_tpu.utils.config import load_reference_config

        m, layers, fail_mask, fresh_oracle = setup
        cfg = load_reference_config(resolution=m.resolution)
        est = TraversabilityEstimator(cfg)
        assert est.set_traversability_map(layers, (0.0, 0.0))

        # pick one failing and one safe center from the fail plane
        ii, jj = np.nonzero(fail_mask)
        rows, cols = fail_mask.shape
        res = m.resolution
        p0 = np.array([rows, cols]) * res / 2.0
        k = len(ii) // 2
        bad_xy = p0 - (np.array([ii[k], jj[k]]) + 0.5) * res
        ok_cells = np.argwhere(~fail_mask)
        # a safe cell well inside a traversable region (max distance from any
        # failing cell): erode via distance transform substitute — pick the
        # safe cell maximizing min distance to failing cells on a subsample
        sub = ok_cells[:: max(1, len(ok_cells) // 400)]
        d = np.abs(sub[:, None, :] - np.stack([ii, jj], -1)[None, ::7, :]).sum(-1)
        good = sub[d.min(1).argmax()]
        good_xy = p0 - (good + 0.5) * res

        fp = self_fp = np.array(
            [[0.1, 0.06], [0.1, -0.06], [-0.1, -0.06], [-0.1, 0.06]], np.float32
        )
        paths = [
            FootprintPath(
                poses=np.array([bad_xy]), radius=0.2,
                compute_untraversable_polygon=True,
            ),
            FootprintPath(
                poses=np.array([good_xy]), radius=0.05,
                compute_untraversable_polygon=True,
            ),
            FootprintPath(
                poses=np.array([[*bad_xy, 0.0], [*(bad_xy + 0.1), 0.0]]),
                footprint=fp, compute_untraversable_polygon=True,
            ),
        ]
        results = est.check_footprint_path(paths)
        assert not results[0].is_safe
        assert results[0].untraversable_polygon is not None
        assert len(results[0].untraversable_polygon) >= 1
        assert results[1].is_safe
        assert results[1].untraversable_polygon is None
        assert not results[2].is_safe
        assert results[2].untraversable_polygon is not None

        # module-level agreement for the circular failure
        want = untraversable.circular_path_untraversable_polygon(
            fail_mask, m.resolution, (0.0, 0.0), np.array([bad_xy]), 0.2, 0.15, 0.5
        )
        got = results[0].untraversable_polygon
        gv = np.asarray(got, np.float64).round(9)
        wv = np.asarray(want, np.float64).round(9)
        assert gv.shape == wv.shape
