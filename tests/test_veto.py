"""Dense veto fields vs the oracle's faithful lazy implementation.

Verdict equivalence is exact (boolean), checked cell-by-cell: the oracle
implements the reference's checkForSlope/Step/Roughness verbatim (lazy, with
memo caches); the dense TPU fields must agree on every cell.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from traversability_estimation_tpu.oracle import filters as OF
from traversability_estimation_tpu.oracle.footprint import OracleMap
from traversability_estimation_tpu.ops.veto import VetoConfig, compute_veto_fields_jit


def _oracle_fields(layers, resolution, cfg: VetoConfig):
    om = OracleMap(
        layers,
        resolution,
        (0.0, 0.0),
        critical_step_height=cfg.critical_step_height,
        max_gap_width=cfg.max_gap_width,
        check_roughness=cfg.check_roughness,
    )
    H, W = layers["elevation"].shape
    slope = np.zeros((H, W), bool)
    step = np.zeros((H, W), bool)
    rough = np.zeros((H, W), bool)
    for i in range(H):
        for j in range(W):
            slope[i, j] = om.check_for_slope((i, j))
            step[i, j] = om.check_for_step((i, j))
            if cfg.check_roughness:
                rough[i, j] = om.check_for_roughness((i, j))
    return slope, step, rough


def _assert_match(layers, resolution, cfg):
    dense = compute_veto_fields_jit({k: jnp.asarray(v) for k, v in layers.items()}, cfg)
    slope_o, step_o, rough_o = _oracle_fields(layers, resolution, cfg)
    np.testing.assert_array_equal(np.asarray(dense["slope_ok"]), slope_o)
    np.testing.assert_array_equal(np.asarray(dense["step_ok"]), step_o)
    if cfg.check_roughness:
        np.testing.assert_array_equal(np.asarray(dense["roughness_ok"]), rough_o)


@pytest.mark.slow
def test_veto_matches_oracle_on_golden_crop(golden_map):
    sl = np.s_[30:80, 40:106]
    layers = {
        k: golden_map.data[k][sl]
        for k in (
            "elevation",
            "traversability",
            "traversability_slope",
            "traversability_step",
            "traversability_roughness",
        )
    }
    cfg = VetoConfig(resolution=golden_map.resolution, check_roughness=True)
    # the crop must actually exercise failures
    assert (layers["traversability_step"] == 0).sum() > 0
    _assert_match(layers, golden_map.resolution, cfg)


@pytest.mark.slow
def test_veto_matches_oracle_synthetic(terrain):
    res = 0.03
    elev = terrain(40, 48, res, seed=11, nan_frac=0.1)
    chain = OF.run_chain(elev, res, OF.DEFAULT_CHAIN_CONFIG, (0.0, 0.0))
    layers = {"elevation": elev, **{k: chain[k] for k in chain}}
    cfg = VetoConfig(resolution=res, check_roughness=True)
    _assert_match(layers, res, cfg)


def test_veto_matches_oracle_coarse(terrain):
    res = 0.06
    elev = terrain(32, 32, res, seed=13, nan_frac=0.05)
    chain = OF.run_chain(elev, res, OF.DEFAULT_CHAIN_CONFIG, (0.0, 0.0))
    layers = {"elevation": elev, **{k: chain[k] for k in chain}}
    cfg = VetoConfig(resolution=res, check_roughness=False)
    _assert_match(layers, res, cfg)


@pytest.mark.slow
def test_footprint_parity_layers(golden_map):
    sl = np.s_[30:60, 40:80]
    layers = {
        k: golden_map.data[k][sl]
        for k in ("elevation", "traversability_slope", "traversability_step")
    }
    cfg = VetoConfig(resolution=golden_map.resolution)
    dense = compute_veto_fields_jit({k: jnp.asarray(v) for k, v in layers.items()}, cfg)
    sf = np.asarray(dense["step_footprint"])
    # NaN exactly where the reference never computes (step != 0)
    nonzero = ~(layers["traversability_step"] == 0.0)
    assert not np.isfinite(sf[nonzero]).any()
    assert np.isfinite(sf[~nonzero]).all()


def test_step_walk_v1_v2_cell_identical(terrain):
    """Round-5 sentinel-folded walk (step_veto_ok) must be cell-exact with
    the round-4 bool-plane formulation (step_veto_ok_v1) — including the
    sharded case where in_map carries real out-of-global padding."""
    from traversability_estimation_tpu.ops.veto import step_veto_ok, step_veto_ok_v1

    res = 0.03
    rng = np.random.default_rng(17)
    for nan_frac in (0.0, 0.08, 0.3):
        elev = terrain(72, 88, res, seed=int(nan_frac * 100) + 3, nan_frac=nan_frac)
        step_l = (0.5 + 0.5 * rng.random(elev.shape)).astype(np.float32)
        step_l[rng.random(elev.shape) < 0.4] = 0.0
        cfg = VetoConfig(resolution=res)
        a = np.asarray(step_veto_ok(jnp.asarray(elev), jnp.asarray(step_l), cfg))
        b = np.asarray(step_veto_ok_v1(jnp.asarray(elev), jnp.asarray(step_l), cfg))
        np.testing.assert_array_equal(a, b)
        in_map = np.ones(elev.shape, bool)
        in_map[:9] = False
        in_map[:, -6:] = False
        a = np.asarray(
            step_veto_ok(jnp.asarray(elev), jnp.asarray(step_l), cfg, jnp.asarray(in_map))
        )
        b = np.asarray(
            step_veto_ok_v1(jnp.asarray(elev), jnp.asarray(step_l), cfg, jnp.asarray(in_map))
        )
        np.testing.assert_array_equal(a, b)
