"""Grid core + geometry parity tests (index math, circle/line/spiral/polygon)."""

import numpy as np
import pytest

from traversability_estimation_tpu.grid import GridMap, geometry


class TestGridMap:
    def test_roundtrip_index_position(self):
        m = GridMap.create((10, 14), 0.1, position=(0.3, -0.2), layers=["elevation"])
        idx = np.array([[0, 0], [9, 13], [4, 7]])
        pos = np.asarray(m.position_of(idx))
        back = np.asarray(m.index_of(pos))
        np.testing.assert_array_equal(back, idx)

    def test_cell_positions_convention(self):
        # index (0,0) is the corner with the largest x and y (grid_map parity)
        m = GridMap.create((4, 4), 0.5, position=(0.0, 0.0), layers=["elevation"])
        x, y = m.cell_positions()
        assert float(x[0, 0]) == pytest.approx(0.75)
        assert float(y[0, 0]) == pytest.approx(0.75)
        assert float(x[3, 0]) == pytest.approx(-0.75)
        assert float(y[0, 3]) == pytest.approx(-0.75)

    def test_is_inside_edges(self):
        m = GridMap.create((4, 4), 0.5, position=(0.0, 0.0), layers=["elevation"])
        # (center - L/2, center + L/2]: upper edge inclusive, lower exclusive
        assert bool(m.is_inside(np.array([1.0, 1.0])))
        assert not bool(m.is_inside(np.array([-1.0, 0.0])))
        assert bool(m.is_inside(np.array([0.999, -0.999])))
        assert not bool(m.is_inside(np.array([1.001, 0.0])))

    def test_add_erase_functional(self):
        m = GridMap.create((4, 4), 0.5, layers=["elevation"])
        m2 = m.add("foo", np.ones((4, 4)))
        assert "foo" not in m.layers and "foo" in m2.layers
        m3 = m2.erase("foo")
        assert "foo" not in m3.layers

    def test_pytree_roundtrip(self):
        import jax

        m = GridMap.create((4, 4), 0.5, layers=["elevation", "traversability"])
        leaves, treedef = jax.tree_util.tree_flatten(m)
        m2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert m2.resolution == m.resolution
        assert sorted(m2.layers) == sorted(m.layers)


class TestCircleOffsets:
    def test_small_circle_includes_center(self):
        offs = geometry.circle_offsets(0.04, 0.03)
        s = {tuple(o) for o in offs.tolist()}
        assert (0, 0) in s
        # radius 0.04 @ res 0.03: cells at distance 0.03 in, 0.042 (diag) out
        assert (1, 0) in s and (0, 1) in s
        assert (1, 1) not in s

    def test_radius_scaling(self):
        offs = geometry.circle_offsets(0.05, 0.03)
        s = {tuple(o) for o in offs.tolist()}
        assert (1, 1) in s  # diag 0.0424 <= 0.05
        assert (2, 0) not in s  # 0.06 > 0.05


class TestLineIterator:
    def _brute_bresenham(self, s, e):
        # independent implementation of grid_map's loop, stateful
        s = np.array(s, dtype=int)
        e = np.array(e, dtype=int)
        delta = np.abs(e - s)
        inc1 = np.where(e >= s, 1, -1)
        inc2 = inc1.copy()
        if delta[0] >= delta[1]:
            inc1[0] = 0
            inc2[1] = 0
            denom, num_add = delta[0], delta[1]
        else:
            inc1[1] = 0
            inc2[0] = 0
            denom, num_add = delta[1], delta[0]
        num = denom // 2
        cells = [s.copy()]
        idx = s.copy()
        for _ in range(denom):
            num += num_add
            if num >= denom:
                num -= denom
                idx = idx + inc1
            idx = idx + inc2
            cells.append(idx.copy())
        return np.array(cells)

    @pytest.mark.parametrize(
        "s,e",
        [
            ((0, 0), (5, 3)),
            ((0, 0), (3, 5)),
            ((7, 2), (1, 9)),
            ((4, 4), (4, 4)),
            ((0, 9), (9, 0)),
            ((2, 3), (2, 8)),
            ((8, 1), (0, 1)),
        ],
    )
    def test_host_matches_reference_algorithm(self, s, e):
        ours = geometry.line_cells_np(np.array(s), np.array(e))
        ref = self._brute_bresenham(s, e)
        np.testing.assert_array_equal(ours, ref)

    def test_device_matches_host(self):
        rng = np.random.default_rng(1)
        starts = rng.integers(0, 30, size=(50, 2))
        ends = rng.integers(0, 30, size=(50, 2))
        cells, valid, n_real = geometry.line_cells_batch(starts, ends, max_cells=40)
        cells, valid, n_real = map(np.asarray, (cells, valid, n_real))
        for b in range(50):
            ref = geometry.line_cells_np(starts[b], ends[b])
            assert n_real[b] == len(ref)
            np.testing.assert_array_equal(cells[b][: len(ref)], ref)
            assert valid[b][: len(ref)].all()
            assert not valid[b][len(ref) :].any()


class TestSpiralOrder:
    def test_rings_sorted_and_complete(self):
        offs, rings = geometry.spiral_order(0.15, 0.03)  # nRings = 5
        assert tuple(offs[0]) == (0, 0) and rings[0] == 0
        # rings are visited in nondecreasing order
        assert (np.diff(rings) >= 0).all()
        # every ring starts at (+d, 0)
        for d in range(1, 6):
            first = offs[np.argmax(rings == d)]
            np.testing.assert_array_equal(first, (d, 0))
        # ring walk visits each offset exactly once
        assert len({tuple(o) for o in offs.tolist()}) == len(offs)

    def test_inner_rings_cover_circle(self):
        radius, res = 0.15, 0.03
        offs, rings = geometry.spiral_order(radius, res)
        # all cells with euclid distance (in cells) strictly inside nRings-2
        # must appear in some inner ring
        inner = {tuple(o) for o, r in zip(offs.tolist(), rings) if r <= 3}
        for di in range(-3, 4):
            for dj in range(-3, 4):
                if int(np.sqrt(di * di + dj * dj)) <= 3:
                    assert (di, dj) in inner or int(np.hypot(di, dj)) > 3


class TestPolygon:
    def test_contains_square(self):
        import jax.numpy as jnp

        verts = jnp.array([[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]])
        pts = jnp.array([[0.0, 0.0], [0.5, 0.5], [1.5, 0.0], [0.0, -1.5]])
        got = np.asarray(geometry.polygon_contains(verts, 4, pts))
        np.testing.assert_array_equal(got, [True, True, False, False])

    def test_contains_with_padding(self):
        import jax.numpy as jnp

        verts = jnp.array(
            [[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]]
        )
        pts = jnp.array([[0.0, 0.0], [2.0, 2.0]])
        got = np.asarray(geometry.polygon_contains(verts, 4, pts))
        np.testing.assert_array_equal(got, [True, False])

    def test_area(self):
        import jax.numpy as jnp

        verts = jnp.array([[1.0, 1.0], [1.0, -1.0], [-1.0, -1.0], [-1.0, 1.0]])
        assert float(geometry.polygon_area(verts, 4)) == pytest.approx(4.0)

    def test_convex_hull(self):
        pts = np.array(
            [[0, 0], [2, 0], [2, 2], [0, 2], [1, 1], [0.5, 0.5], [2, 1]], dtype=float
        )
        hull = geometry.convex_hull_np(pts)
        assert len(hull) == 4
        assert {tuple(p) for p in hull.tolist()} == {(0, 0), (2, 0), (2, 2), (0, 2)}


class TestGetSubmap:
    """GridMap.get_submap — grid_map getSubmap(position, length, isSuccess)
    parity (used by the reference's getTraversabilityMap service,
    TraversabilityEstimation.cpp:297-316)."""

    def _map(self):
        rng = np.random.default_rng(3)
        data = rng.standard_normal((10, 14)).astype(np.float32)
        m = GridMap.create(
            (10, 14), 0.1, position=(0.3, -0.2), layers=["elevation"]
        )
        return m.add("elevation", data), data

    def test_interior_request_exact_cells(self):
        m, data = self._map()
        # centered on cell (4,7)'s center (0.35, -0.25); 0.25 m square
        sub, ok = m.get_submap((0.35, -0.25), (0.25, 0.25))
        assert ok
        assert sub.size == (3, 3)
        np.testing.assert_allclose(
            np.asarray(sub.position), [0.35, -0.25], atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(sub["elevation"]), data[3:6, 6:9]
        )

    def test_partially_off_map_clips_and_succeeds(self):
        m, data = self._map()
        # x range (0.55, 0.95) sticks out beyond the 0.8 edge -> clipped to
        # the 3 cells covering (0.5, 0.8]; center stays on-map -> success.
        # (y length 0.18 keeps the request off exact cell edges — edge-exact
        # requests are float-ill-conditioned in grid_map as well)
        sub, ok = m.get_submap((0.75, 0.0), (0.4, 0.18))
        assert ok
        assert sub.size == (3, 2)
        np.testing.assert_allclose(
            np.asarray(sub.position), [0.65, 0.0], atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(sub["elevation"]), data[0:3, 4:6]
        )

    def test_fully_off_map_fails(self):
        m, _ = self._map()
        _, ok = m.get_submap((2.0, 0.0), (0.4, 0.4))
        assert not ok
        _, ok = m.get_submap((0.3, -5.0), (0.4, 0.4))
        assert not ok

    def test_oversized_request_returns_whole_map(self):
        m, data = self._map()
        sub, ok = m.get_submap((0.3, -0.2), (10.0, 10.0))
        assert ok
        assert sub.size == (10, 14)
        np.testing.assert_allclose(np.asarray(sub.position), [0.3, -0.2], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(sub["elevation"]), data)

    def test_fuzz_value_identity_via_world_positions(self):
        """Every successful submap cell must hold the parent cell's value at
        the same world position (the index-math oracle, incl. partially
        off-map requests)."""
        m, data = self._map()
        rng = np.random.default_rng(11)
        n_ok = 0
        for _ in range(60):
            center = rng.uniform([-0.4, -1.2], [1.0, 0.6])
            length = rng.uniform(0.05, 1.2, 2)
            sub, ok = m.get_submap(tuple(center), tuple(length))
            if not ok:
                # success=False iff the requested center is off the parent map
                assert not bool(m.is_inside(np.asarray(center, np.float32)))
                continue
            n_ok += 1
            r, c = sub.size
            idx = np.stack(np.meshgrid(np.arange(r), np.arange(c), indexing="ij"), -1)
            world = np.asarray(sub.position_of(idx.reshape(-1, 2)))
            parent_idx = np.asarray(m.index_of(world))
            assert (parent_idx >= 0).all()
            assert (parent_idx < np.array(m.size)).all()
            np.testing.assert_array_equal(
                np.asarray(sub["elevation"]).reshape(-1),
                data[parent_idx[:, 0], parent_idx[:, 1]],
            )
        assert n_ok >= 10  # the fuzz box actually exercises successes
