"""Native (C++) components: reference baseline engine + fast bag reader."""

import numpy as np
import pytest

from traversability_estimation_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native libs not built (csrc/build.sh)"
)


def test_native_chain_matches_oracle(terrain):
    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.oracle import filters as OF

    res = 0.03
    elev = terrain(48, 48, res, seed=51, nan_frac=0.08)
    nat = native.baseline_run_chain(elev, res, ChainConfig(resolution=res))
    ref = OF.run_chain(elev, res, OF.DEFAULT_CHAIN_CONFIG, (0.0, 0.0))
    for k in ("traversability_slope", "traversability_step", "traversability_roughness"):
        a, b = nat[k], ref[k]
        assert (np.isfinite(a) == np.isfinite(b)).all(), k
        both = np.isfinite(a) & np.isfinite(b)
        np.testing.assert_allclose(a[both], b[both], atol=1e-6, err_msg=k)


def test_native_circles_match_oracle(golden_map, rng):
    from traversability_estimation_tpu.oracle.footprint import OracleMap

    layers = {
        k: golden_map.data[k]
        for k in (
            "elevation",
            "traversability",
            "traversability_slope",
            "traversability_step",
        )
    }
    eng = native.BaselineQueryEngine(layers, golden_map.resolution)
    centers = np.stack(
        [rng.uniform(-1.2, 1.2, 80), rng.uniform(-1.7, 1.7, 80)], axis=-1
    )
    ok, trav = eng.check_circles(centers, 0.45, 0.3)
    for b in range(80):
        om = OracleMap(
            layers, golden_map.resolution, (0.0, 0.0),
            critical_step_height=0.12, max_gap_width=0.3,
            traversability_default=0.5, check_roughness=False,
        )
        o_ok, o_trav, _ = om.is_traversable_circle(centers[b], 0.45, 0.3)
        assert bool(ok[b]) == o_ok, f"center {centers[b]}"
        if o_ok:
            assert trav[b] == pytest.approx(o_trav, abs=1e-5)
    assert ok.sum() > 0 and (~ok).sum() > 0


def test_native_bag_reader_matches_python(golden_map):
    from tests.conftest import GOLDEN_ELEVATION_BAG

    msg = native.load_grid_map_bag_native(GOLDEN_ELEVATION_BAG)
    assert msg.size == golden_map.size
    assert msg.resolution == golden_map.resolution
    assert set(msg.layers) == set(golden_map.layers)
    for k in ("elevation", "traversability"):
        np.testing.assert_array_equal(msg.data[k], golden_map.data[k])


def test_native_polygon_paths_match_oracle():
    """Native polygonal path baseline == Python oracle (pass AND fail paths)."""
    import numpy as np
    import pytest

    from traversability_estimation_tpu.oracle import filters as of
    from traversability_estimation_tpu.oracle.footprint import OracleMap
    from traversability_estimation_tpu.utils import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    res = 0.03
    H = W = 48
    x = np.arange(H)[:, None] * res
    y = np.arange(W)[None, :] * res
    # gentle terrain with a hard wall: both verdict branches exercised
    elev = (
        0.05 * np.sin(2 * x) * np.cos(1.5 * y)
        + 0.004 * rng.standard_normal((H, W))
        + 0.5 * (x > x.mean() + 0.2)
    ).astype(np.float32)
    elev[rng.random((H, W)) < 0.01] = np.nan
    layers = {"elevation": elev, **of.run_chain(elev, res, of.DEFAULT_CHAIN_CONFIG)}
    eng = native.BaselineQueryEngine(layers, res, 0.12, 0.3, 0.5)
    om = OracleMap(
        layers, res, (0.0, 0.0), critical_step_height=0.12, max_gap_width=0.3,
        traversability_default=0.5, check_roughness=False,
    )
    fp = np.array([[0.09, 0.06], [0.09, -0.06], [-0.09, -0.06], [-0.09, 0.06]])
    P, N = 24, 4
    ext = H * res / 2 * 0.7
    starts = np.stack([rng.uniform(-ext, ext, P), rng.uniform(-ext, ext, P)], -1)
    steps = rng.uniform(-0.05, 0.05, (P, N - 1, 2))
    poses = np.concatenate([starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1)
    ok_n, tv_n = eng.check_polygon_paths(poses, fp)
    n_safe = 0
    for p in range(P):
        poses3 = np.concatenate([poses[p], np.zeros((N, 1))], 1)
        quats = np.tile([0, 0, 0, 1.0], (N, 1))
        r = om.check_polygonal_footprint_path(poses3, quats, fp)
        assert bool(ok_n[p]) == bool(r.is_safe), p
        if r.is_safe:
            n_safe += 1
            assert tv_n[p] == pytest.approx(r.traversability, abs=1e-9), p
    assert 0 < n_safe < P  # both branches exercised

    # single-pose paths: the raw footprint at pose 0 must be evaluated
    ok_1, tv_1 = eng.check_polygon_paths(poses[:, :1, :], fp)
    n_safe1 = 0
    for p in range(P):
        r = om.check_polygonal_footprint_path(
            np.concatenate([poses[p, :1], np.zeros((1, 1))], 1),
            np.tile([0, 0, 0, 1.0], (1, 1)),
            fp,
        )
        assert bool(ok_1[p]) == bool(r.is_safe), p
        if r.is_safe:
            n_safe1 += 1
            assert tv_1[p] == pytest.approx(r.traversability, abs=1e-9), p
    assert 0 < n_safe1 < P
