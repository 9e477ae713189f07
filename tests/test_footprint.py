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


class TestSweptHullTranslates:
    """The identity-orientation fast path: hull(P u P+d) emitted as O(V)
    selects (fp_ops.swept_hull_translates) must equal the general device
    hull geometrically and keep oracle parity end to end."""

    def test_emission_matches_general_hull(self, rng):
        fp = np.array(
            [[0.45, 0.3], [0.45, -0.3], [-0.45, -0.3], [-0.45, 0.3]], np.float32
        )
        B = 64
        p1 = rng.uniform(-1, 1, (B, 2)).astype(np.float32)
        # include degenerate d = 0 and axis-aligned translations
        d = rng.uniform(-0.5, 0.5, (B, 2)).astype(np.float32)
        d[0] = 0.0
        d[1] = [0.3, 0.0]
        d[2] = [0.0, -0.2]
        poly1 = p1[:, None, :] + fp[None]
        poly2 = (p1 + d)[:, None, :] + fp[None]
        hull_f, n_f = fp_ops.swept_hull_translates(
            jnp.asarray(poly1), jnp.asarray(poly2), jnp.asarray(fp), jnp.asarray(d)
        )
        pts = np.concatenate([poly1, poly2], axis=1)
        hull_g, n_g = convex_hull_batch(
            jnp.asarray(pts), jnp.full((B,), 8, jnp.int32)
        )
        hull_f, n_f = np.asarray(hull_f), np.asarray(n_f)
        hull_g, n_g = np.asarray(hull_g), np.asarray(n_g)
        probe = rng.uniform(-2, 2, (B, 200, 2)).astype(np.float32)
        for b in range(B):
            # identical enclosed area (duplicates contribute nothing)
            a_f = float(geometry.polygon_area(jnp.asarray(hull_f[b]), int(n_f[b])))
            a_g = float(geometry.polygon_area(jnp.asarray(hull_g[b]), int(n_g[b])))
            assert a_f == pytest.approx(a_g, rel=1e-5, abs=1e-7), b
            # identical membership on probe points (off-boundary)
            in_f = np.asarray(
                geometry.polygon_contains(
                    jnp.asarray(hull_f[b]), int(n_f[b]), jnp.asarray(probe[b])
                )
            )
            in_g = np.asarray(
                geometry.polygon_contains(
                    jnp.asarray(hull_g[b]), int(n_g[b]), jnp.asarray(probe[b])
                )
            )
            np.testing.assert_array_equal(in_f, in_g, err_msg=f"hull {b}")

    def test_translate_paths_match_general_and_oracle(self, setup, rng):
        m, layers, state, fresh_oracle = setup
        fp = np.array(
            [[0.2, 0.12], [0.2, -0.12], [-0.2, -0.12], [-0.2, 0.12]], np.float32
        )
        P, N = 16, 4
        starts = np.stack(
            [rng.uniform(-0.8, 0.8, P), rng.uniform(-1.2, 1.2, P)], axis=-1
        )
        steps = rng.uniform(-0.2, 0.2, size=(P, N - 1, 2))
        poses2 = np.concatenate(
            [starts[:, None, :], starts[:, None, :] + np.cumsum(steps, axis=1)], axis=1
        )
        pos3 = np.concatenate([poses2, np.zeros((P, N, 1))], axis=-1).astype(np.float32)
        quats = np.zeros((P, N, 4), np.float32)
        quats[..., 3] = 1.0  # identity orientation everywhere
        n_poses = rng.integers(1, N + 1, size=P).astype(np.int32)
        assert fp_ops.is_convex_polygon(fp)

        window = fp_ops.polygon_window_cells(
            fp, 0.35, m.resolution, False, identity_orientation=True
        )
        fast = fp_ops.check_polygonal_paths(
            state, jnp.asarray(pos3), jnp.asarray(quats), jnp.asarray(n_poses),
            jnp.asarray(fp), window, False, translate_only=True,
        )
        slow = fp_ops.check_polygonal_paths(
            state, jnp.asarray(pos3), jnp.asarray(quats), jnp.asarray(n_poses),
            jnp.asarray(fp), window, False, translate_only=False,
        )
        np.testing.assert_array_equal(np.asarray(fast[0]), np.asarray(slow[0]))
        np.testing.assert_allclose(np.asarray(fast[1]), np.asarray(slow[1]), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(fast[2]), np.asarray(slow[2]), rtol=1e-5, atol=1e-6
        )

        safe, trav, area = (np.asarray(a) for a in fast)
        for p in range(P):
            om = fresh_oracle()
            r = om.check_polygonal_footprint_path(
                pos3[p, : n_poses[p]], quats[p, : n_poses[p]], fp, conservative=False
            )
            assert safe[p] == r.is_safe, f"path {p}"
            if r.is_safe:
                assert trav[p] == pytest.approx(r.traversability, abs=1e-4)
                assert area[p] == pytest.approx(r.area, rel=1e-3, abs=1e-4)


class TestGroupedPaths:
    """check_polygonal_paths_grouped (one window per path) vs the per-segment
    evaluator: exact verdict parity, matching scores/areas — rotated and
    identity orientations, conservative mode, ragged pose counts."""

    def _run(self, setup, rng, identity, conservative):
        m, layers, state, fresh_oracle = setup
        fp = np.array(
            [[0.2, 0.12], [0.2, -0.12], [-0.2, -0.12], [-0.2, 0.12]], np.float32
        )
        P, N = 24, 5
        starts = np.stack(
            [rng.uniform(-0.9, 0.9, P), rng.uniform(-1.3, 1.3, P)], axis=-1
        )
        steps = rng.uniform(-0.2, 0.2, size=(P, N - 1, 2))
        poses2 = np.concatenate(
            [starts[:, None, :], starts[:, None, :] + np.cumsum(steps, axis=1)], axis=1
        )
        pos3 = np.concatenate([poses2, np.zeros((P, N, 1))], axis=-1).astype(np.float32)
        quats = np.zeros((P, N, 4), np.float32)
        if identity:
            quats[..., 3] = 1.0
        else:
            yaws = rng.uniform(0, 2 * np.pi, size=(P, N))
            quats[..., 2] = np.sin(yaws / 2)
            quats[..., 3] = np.cos(yaws / 2)
        n_poses = rng.integers(1, N + 1, size=P).astype(np.int32)
        # grouped-evaluator contract: padding repeats the last valid pose
        for p in range(P):
            pos3[p, n_poses[p]:] = pos3[p, n_poses[p] - 1]
            quats[p, n_poses[p]:] = quats[p, n_poses[p] - 1]

        translate_only = identity and not conservative
        ext = pos3[..., :2].max(axis=1) - pos3[..., :2].min(axis=1)
        gw = fp_ops.path_group_window(fp, ext, m.resolution, identity)
        grouped = fp_ops.check_polygonal_paths_grouped(
            state, jnp.asarray(pos3), jnp.asarray(quats), jnp.asarray(n_poses),
            jnp.asarray(fp), gw, conservative, translate_only,
        )
        # block-window mode: per-(path, segment-block) windows run the same
        # exact world-coordinate comparisons against a different fetched
        # region — verdicts and areas are bit-identical; the masked score
        # SUM may differ in the last ulp (different accumulation order over
        # a different window shape)
        bw = fp_ops.path_block_window(fp, pos3, m.resolution, identity)
        grouped_b = fp_ops.check_polygonal_paths_grouped(
            state, jnp.asarray(pos3), jnp.asarray(quats), jnp.asarray(n_poses),
            jnp.asarray(fp), gw, conservative, translate_only, block_window=bw,
        )
        np.testing.assert_array_equal(
            np.asarray(grouped[0]), np.asarray(grouped_b[0])
        )
        np.testing.assert_allclose(
            np.asarray(grouped[1]), np.asarray(grouped_b[1]), atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(grouped[2]), np.asarray(grouped_b[2])
        )
        window = fp_ops.polygon_window_cells(
            fp, 0.35, m.resolution, conservative, identity_orientation=identity
        )
        seg = fp_ops.check_polygonal_paths(
            state, jnp.asarray(pos3), jnp.asarray(quats), jnp.asarray(n_poses),
            jnp.asarray(fp), window, conservative, translate_only,
        )
        np.testing.assert_array_equal(np.asarray(grouped[0]), np.asarray(seg[0]))
        np.testing.assert_allclose(
            np.asarray(grouped[1]), np.asarray(seg[1]), atol=3e-6
        )
        np.testing.assert_allclose(
            np.asarray(grouped[2]), np.asarray(seg[2]), rtol=1e-5, atol=1e-6
        )
        assert np.asarray(grouped[0]).sum() > 0
        assert (~np.asarray(grouped[0])).sum() > 0

    def test_identity(self, setup, rng):
        self._run(setup, rng, identity=True, conservative=False)

    def test_identity_conservative(self, setup, rng):
        self._run(setup, rng, identity=True, conservative=True)

    def test_rotated(self, setup, rng):
        self._run(setup, rng, identity=False, conservative=False)

    def test_rotated_conservative(self, setup, rng):
        self._run(setup, rng, identity=False, conservative=True)

    def test_exact_window_and_fetch_modes(self, setup, rng, monkeypatch):
        """Round-5 rotated-window work (VERDICT r4 weak #2): the exact
        realized-yaw window must be no larger than the worst-case-rotation
        bound and verdict/score/area-identical; the three window-fetch
        materializations must be bit-identical."""
        m, layers, state, fresh_oracle = setup
        fp = np.array(
            [[0.2, 0.12], [0.2, -0.12], [-0.2, -0.12], [-0.2, 0.12]], np.float32
        )
        P, N = 24, 5
        starts = np.stack(
            [rng.uniform(-0.9, 0.9, P), rng.uniform(-1.3, 1.3, P)], axis=-1
        )
        steps = rng.uniform(-0.2, 0.2, size=(P, N - 1, 2))
        poses2 = np.concatenate(
            [starts[:, None, :], starts[:, None, :] + np.cumsum(steps, axis=1)],
            axis=1,
        )
        pos3 = np.concatenate(
            [poses2, np.zeros((P, N, 1))], axis=-1
        ).astype(np.float32)
        yaws = rng.uniform(0, 2 * np.pi, size=(P, N))
        quats = np.zeros((P, N, 4), np.float32)
        quats[..., 2] = np.sin(yaws / 2)
        quats[..., 3] = np.cos(yaws / 2)
        n_poses = np.full((P,), N, np.int32)

        ext = pos3[..., :2].max(axis=1) - pos3[..., :2].min(axis=1)
        gw = fp_ops.path_group_window(fp, ext, m.resolution, False)
        gw_x = fp_ops.path_group_window_exact(fp, pos3, quats, m.resolution)
        assert gw_x[0] <= gw[0] and gw_x[1] <= gw[1], (gw_x, gw)

        def run(window, conservative=False):
            return fp_ops.check_polygonal_paths_grouped(
                state, jnp.asarray(pos3), jnp.asarray(quats),
                jnp.asarray(n_poses), jnp.asarray(fp), window,
                conservative, False,
            )

        for conservative in (False, True):
            a = run(gw, conservative)
            b = run(gw_x, conservative)
            np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
            # score sums accumulate over a different window shape: last-ulp
            np.testing.assert_allclose(
                np.asarray(a[1]), np.asarray(b[1]), atol=1e-6
            )
            np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))

        base = run(gw_x)
        for mode in ("transpose", "rowgather"):
            monkeypatch.setattr(fp_ops, "_WINDOW_FETCH_MODE", mode)
            got = run(gw_x)
            for i in range(3):
                np.testing.assert_array_equal(
                    np.asarray(base[i]), np.asarray(got[i]), err_msg=mode
                )
        monkeypatch.setattr(fp_ops, "_WINDOW_FETCH_MODE", "fused")

        # window bucketing (round 5): per-bucket static windows, all inside
        # one program — verdict/area identical, trav within re-accumulation
        for n_buckets in (2, 3):
            for conservative in (False, True):
                plan = fp_ops.plan_window_buckets(
                    fp, pos3, quats, m.resolution, n_buckets
                )
                got = fp_ops.check_polygonal_paths_bucketed(
                    state, jnp.asarray(pos3), jnp.asarray(quats),
                    jnp.asarray(n_poses), jnp.asarray(fp), plan,
                    conservative, False,
                )
                ref = run(gw, conservative)
                np.testing.assert_array_equal(
                    np.asarray(ref[0]), np.asarray(got[0])
                )
                np.testing.assert_allclose(
                    np.asarray(ref[1]), np.asarray(got[1]), atol=1e-6
                )
                np.testing.assert_array_equal(
                    np.asarray(ref[2]), np.asarray(got[2])
                )
