"""Batched footprint evaluators vs the sequential oracle — verdict + score parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from traversability_estimation_tpu.grid import geometry
from traversability_estimation_tpu.oracle import filters as OF
from traversability_estimation_tpu.oracle.footprint import OracleMap
from traversability_estimation_tpu.ops import footprint as fp_ops
from traversability_estimation_tpu.ops.hull import convex_hull_batch
from traversability_estimation_tpu.ops.veto import VetoConfig, compute_veto_fields_jit


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
    state = fp_ops.QueryState(
        traversability=jnp.asarray(layers["traversability"]),
        traversable_mask=veto["traversable_mask"],
        position=jnp.zeros(2, jnp.float32),
        resolution=m.resolution,
        default_traversability=0.5,
    )

    def fresh_oracle():
        return OracleMap(
            layers,
            m.resolution,
            (0.0, 0.0),
            critical_step_height=0.12,
            max_gap_width=0.3,
            traversability_default=0.5,
            check_roughness=False,
        )

    return m, layers, state, fresh_oracle


class TestHull:
    def test_matches_host_hull(self, rng):
        pts = rng.random((32, 16, 2)).astype(np.float32)
        n_valid = np.full((32,), 16, np.int32)
        hulls, n_hull = convex_hull_batch(jnp.asarray(pts), jnp.asarray(n_valid))
        hulls, n_hull = np.asarray(hulls), np.asarray(n_hull)
        for b in range(32):
            ref = geometry.convex_hull_np(pts[b])
            got = hulls[b][: n_hull[b]]
            assert len(got) == len(ref)
            # same vertex set, CCW order (rotation offset allowed)
            assert {tuple(np.round(p, 5)) for p in got.tolist()} == {
                tuple(np.round(p, 5)) for p in ref.tolist()
            }

    def test_duplicate_points(self):
        sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        pts = np.concatenate([sq, sq], axis=0)
        hull, n_hull = convex_hull_batch(
            jnp.asarray(pts[None]), jnp.asarray([8], jnp.int32)
        )
        assert int(n_hull[0]) == 4


class TestCircles:
    def test_single_circles_match_oracle(self, setup, rng):
        m, layers, state, fresh_oracle = setup
        # centers across the map incl. outside positions
        centers = np.stack(
            [
                rng.uniform(-1.8, 1.8, size=200),
                rng.uniform(-2.3, 2.3, size=200),
            ],
            axis=-1,
        ).astype(np.float32)
        radius, rmin = 0.25 + 0.15, 0.25
        ok, trav = fp_ops.check_circles(state, jnp.asarray(centers), radius, rmin)
        ok, trav = np.asarray(ok), np.asarray(trav)
        n_checked = 0
        for b in range(len(centers)):
            # fresh oracle per query: the reference's per-cell memo can serve
            # a stale value when two queries share a center cell but not the
            # exact sub-cell position (documented deviation: we compute fresh)
            om = fresh_oracle()
            o_ok, o_trav, _ = om.is_traversable_circle(centers[b], radius, rmin)
            assert ok[b] == o_ok, f"center {centers[b]}: {ok[b]} vs oracle {o_ok}"
            if o_ok:
                # on failure the C++ (and oracle) leave an unnormalized
                # running sum in the out-param; callers ignore it
                assert trav[b] == pytest.approx(o_trav, abs=2e-5), f"center {centers[b]}"
            n_checked += 1
        assert n_checked == 200
        assert (~ok).sum() > 0  # the golden map has untraversable regions

    def test_radius_zero_semantics(self, setup):
        m, layers, state, fresh_oracle = setup
        centers = np.array([[0.0, 0.0], [0.9, -1.0], [-0.5, 1.2]], np.float32)
        ok, trav = fp_ops.check_circles(state, jnp.asarray(centers), 0.2, 0.0)
        for b in range(len(centers)):
            om = fresh_oracle()
            o_ok, o_trav, _ = om.is_traversable_circle(centers[b], 0.2, 0.0)
            assert bool(np.asarray(ok)[b]) == o_ok
            if o_ok:
                assert float(np.asarray(trav)[b]) == pytest.approx(o_trav, abs=2e-5)


class TestCircularPaths:
    @pytest.mark.slow
    def test_paths_match_oracle(self, setup, rng):
        m, layers, state, fresh_oracle = setup
        P, N = 40, 5
        starts = np.stack(
            [rng.uniform(-1.0, 1.0, P), rng.uniform(-1.5, 1.5, P)], axis=-1
        )
        steps = rng.uniform(-0.25, 0.25, size=(P, N - 1, 2))
        poses = np.concatenate(
            [starts[:, None, :], starts[:, None, :] + np.cumsum(steps, axis=1)], axis=1
        ).astype(np.float32)
        n_poses = rng.integers(1, N + 1, size=P).astype(np.int32)
        radius = 0.2

        safe, trav = fp_ops.check_circular_paths(
            state, jnp.asarray(poses), jnp.asarray(n_poses), radius, 0.15, 48
        )
        safe, trav = np.asarray(safe), np.asarray(trav)
        n_mismatch = 0
        for p in range(P):
            om = fresh_oracle()  # fresh memo per path, like a fresh map epoch
            r = om.check_circular_footprint_path(
                poses[p, : n_poses[p]], radius, 0.15
            )
            assert safe[p] == r.is_safe, f"path {p}"
            if r.is_safe:
                assert trav[p] == pytest.approx(r.traversability, abs=5e-5), f"path {p}"
        assert safe.sum() > 0 and (~safe).sum() > 0


class TestPolygons:
    def test_single_polygons_match_oracle(self, setup, rng):
        m, layers, state, fresh_oracle = setup
        fp = np.array(
            [[0.25, 0.15], [0.25, -0.15], [-0.25, -0.15], [-0.25, 0.15]], np.float32
        )
        B = 60
        centers = np.stack(
            [rng.uniform(-1.2, 1.2, B), rng.uniform(-1.7, 1.7, B)], axis=-1
        ).astype(np.float32)
        yaws = rng.uniform(0, 2 * np.pi, B)
        polys = np.zeros((B, 4, 2), np.float32)
        for b in range(B):
            c, s = np.cos(yaws[b]), np.sin(yaws[b])
            R = np.array([[c, -s], [s, c]])
            polys[b] = centers[b] + fp @ R.T
        window = fp_ops.polygon_window_cells(fp, 0.0, m.resolution)
        ok, trav, _ = fp_ops.check_polygons(
            state,
            jnp.asarray(polys),
            jnp.full((B,), 4, jnp.int32),
            jnp.asarray(centers),
            window,
        )
        ok, trav = np.asarray(ok), np.asarray(trav)
        for b in range(B):
            om = fresh_oracle()
            o_ok, o_trav, _ = om.is_traversable_polygon(polys[b])
            assert ok[b] == o_ok, f"poly {b} center {centers[b]}"
            if o_ok:
                assert trav[b] == pytest.approx(o_trav, abs=2e-5)
        assert ok.sum() > 0 and (~ok).sum() > 0

    @pytest.mark.slow
    def test_polygonal_paths_match_oracle(self, setup, rng):
        m, layers, state, fresh_oracle = setup
        fp = np.array(
            [[0.2, 0.12], [0.2, -0.12], [-0.2, -0.12], [-0.2, 0.12]], np.float32
        )
        P, N = 12, 4
        starts = np.stack(
            [rng.uniform(-0.8, 0.8, P), rng.uniform(-1.2, 1.2, P)], axis=-1
        )
        steps = rng.uniform(-0.2, 0.2, size=(P, N - 1, 2))
        poses2 = np.concatenate(
            [starts[:, None, :], starts[:, None, :] + np.cumsum(steps, axis=1)], axis=1
        )
        yaws = rng.uniform(0, 2 * np.pi, size=(P, N))
        pos3 = np.concatenate([poses2, np.zeros((P, N, 1))], axis=-1).astype(np.float32)
        quats = np.zeros((P, N, 4), np.float32)
        quats[..., 2] = np.sin(yaws / 2)
        quats[..., 3] = np.cos(yaws / 2)
        n_poses = rng.integers(1, N + 1, size=P).astype(np.int32)

        for conservative in (False, True):
            window = fp_ops.polygon_window_cells(fp, 0.35, m.resolution, conservative)
            safe, trav, area = fp_ops.check_polygonal_paths(
                state,
                jnp.asarray(pos3),
                jnp.asarray(quats),
                jnp.asarray(n_poses),
                jnp.asarray(fp),
                window,
                conservative,
            )
            safe, trav, area = map(np.asarray, (safe, trav, area))
            for p in range(P):
                om = fresh_oracle()
                r = om.check_polygonal_footprint_path(
                    pos3[p, : n_poses[p]],
                    quats[p, : n_poses[p]],
                    fp,
                    conservative=conservative,
                )
                assert safe[p] == r.is_safe, f"cons={conservative} path {p}"
                if r.is_safe:
                    assert trav[p] == pytest.approx(r.traversability, abs=1e-4)
                    assert area[p] == pytest.approx(r.area, rel=1e-3, abs=1e-4)


class TestDenseFields:
    @pytest.mark.slow
    def test_dense_polygon_field_matches_oracle(self, setup):
        m, layers, state, fresh_oracle = setup
        fp = np.array(
            [[0.25, 0.15], [0.25, -0.15], [-0.25, -0.15], [-0.25, 0.15]], np.float64
        )
        ok, trav = fp_ops.dense_polygon_field(state, fp)
        ok, trav = np.asarray(ok), np.asarray(trav)
        om = fresh_oracle()
        rows, cols = ok.shape
        rng = np.random.default_rng(9)
        verdict_mismatch = 0
        for _ in range(60):
            i = int(rng.integers(5, rows - 5))
            j = int(rng.integers(5, cols - 5))
            center = om.cell_position((i, j))
            o_ok, o_trav, _ = om.is_traversable_polygon(center + fp)
            if ok[i, j] != o_ok:
                verdict_mismatch += 1
            elif o_ok:
                # footprint dims that are exact multiples of the resolution
                # put whole cell ROWS exactly on the polygon edge; the oracle
                # (like the C++) includes them by float luck, the static rule
                # excludes them — means shift by ~boundary/area (see PARITY.md)
                assert abs(trav[i, j] - o_trav) < 0.05
        assert verdict_mismatch <= 2

    def test_dense_circle_field_matches_per_query(self, setup, rng):
        m, layers, state, fresh_oracle = setup
        ok_f, trav_f = fp_ops.dense_circle_field(state, 0.4, 0.25)
        ok_f, trav_f = np.asarray(ok_f), np.asarray(trav_f)
        om = fresh_oracle()
        rows, cols = ok_f.shape
        mismatch = 0
        for _ in range(60):
            i = int(rng.integers(0, rows))
            j = int(rng.integers(0, cols))
            center = om.cell_position((i, j))
            om2 = fresh_oracle()
            o_ok, o_trav, _ = om2.is_traversable_circle(center, 0.4, 0.25)
            if ok_f[i, j] != o_ok:
                mismatch += 1
            elif o_ok and abs(trav_f[i, j] - o_trav) > 5e-5:
                mismatch += 1
        assert mismatch <= 1
