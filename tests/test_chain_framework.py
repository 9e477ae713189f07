"""Declarative filter-chain framework + safe expression compiler tests.

Covers the pluginlib/FilterChain analog (ops/chain.py): the reference
configures an ordered name/type/params filter list at runtime
(TraversabilityMap.cpp:129, config/robot_filter_parameter.yaml); here the
same list compiles into one jitted composite. The generic path must agree
with the fused fast path on the reference chain, and must support chains the
fast path cannot represent.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import yaml

from tests.conftest import synthetic_terrain
from traversability_estimation_tpu.ops import chain as chain_mod
from traversability_estimation_tpu.ops import expr as expr_mod
from traversability_estimation_tpu.ops import filters as f_ops

REF_FILTER_YAML = (
    "/root/reference/traversability_estimation/config/robot_filter_parameter.yaml"
)


# ---------------------------------------------------------------------------
# expression compiler
# ---------------------------------------------------------------------------


def test_expr_arithmetic_and_functions():
    cases = {
        "1 + 2 * 3": 7.0,
        "(1 + 2) * 3": 9.0,
        "2 ^ 3 ^ 2": 512.0,  # right-assoc
        "-2^2": -4.0,  # unary binds looser than ^
        "min(3, 1, 2)": 1.0,
        "max(3, 1, 2)": 3.0,
        "sqrt(9) + abs(-1)": 4.0,
        "1e-3 * 1000": 1.0,
        "cwiseMax(0.5, 0.25)": 0.5,
    }
    for src, want in cases.items():
        got = float(expr_mod.evaluate(expr_mod.parse(src), {}))
        assert got == pytest.approx(want), src


def test_expr_layers_and_acos():
    x = jnp.asarray(np.linspace(-1, 1, 64, dtype=np.float32))
    out = expr_mod.evaluate(expr_mod.parse("acos(nz) / 2 + asin(nz)"), {"nz": x})
    ref = np.arccos(np.asarray(x)) / 2 + np.arcsin(np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_expr_rejects_malicious_and_malformed():
    for bad in (
        "__import__('os')",
        "().__class__",
        "open('x')",
        "1 +",
        "foo(1)",
        "1 2",
        "@",
    ):
        with pytest.raises(expr_mod.ExpressionError):
            expr_mod.evaluate(expr_mod.parse(bad), {})


def test_expr_unknown_layer_message():
    with pytest.raises(expr_mod.ExpressionError, match="unknown layer"):
        expr_mod.evaluate(expr_mod.parse("a + b"), {"a": jnp.zeros((2, 2))})


def test_expr_variables_order():
    fn = expr_mod.compile_expression("b + a * b")
    assert fn.variables == ("b", "a")


# ---------------------------------------------------------------------------
# generic chain vs fused fast path on the reference chain
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_specs():
    with open(REF_FILTER_YAML) as f:
        doc = yaml.safe_load(f)
    return tuple(
        chain_mod.FilterSpec.from_dict(e) for e in doc["traversability_map_filters"]
    )


def test_reference_chain_generic_matches_fused(ref_specs):
    res = 0.03
    elev = jnp.asarray(synthetic_terrain(48, 56, res, seed=3))
    generic = chain_mod.run_spec_chain_jit({"elevation": elev}, ref_specs, res)
    fused = f_ops.run_chain_jit(elev, f_ops.ChainConfig(resolution=res))
    for layer in (
        "traversability_slope",
        "traversability_step",
        "traversability_roughness",
        "traversability",
    ):
        np.testing.assert_allclose(
            np.asarray(generic[layer]),
            np.asarray(fused[layer]),
            rtol=1e-5,
            atol=1e-6,
            equal_nan=True,
            err_msg=layer,
        )
    # DeletionFilter dropped the normals, like the reference chain's last stage
    assert "surface_normal_z" not in generic
    assert "elevation" in generic


def test_unknown_filter_type_raises():
    with pytest.raises(chain_mod.ChainCompileError, match="unknown filter type"):
        chain_mod.compile_chain(
            [{"name": "x", "type": "gridMapFilters/NoSuchFilter", "params": {}}], 0.03
        )


def test_slope_without_normals_raises():
    with pytest.raises(chain_mod.ChainCompileError, match="normals"):
        chain_mod.compile_chain(
            [{"name": "s", "type": "traversabilityFilters/SlopeFilter", "params": {}}],
            0.03,
        )({"elevation": jnp.zeros((8, 8))})


# ---------------------------------------------------------------------------
# chains the fast path cannot represent
# ---------------------------------------------------------------------------


def test_custom_chain_duplication_threshold_smoothing():
    res = 0.03
    elev = jnp.asarray(synthetic_terrain(40, 40, res, seed=5, nan_frac=0.1))
    specs = [
        {"name": "d", "type": "gridMapFilters/DuplicationFilter",
         "params": {"input_layer": "elevation", "output_layer": "elev_copy"}},
        {"name": "m", "type": "gridMapFilters/MeanInRadiusFilter",
         "params": {"input_layer": "elevation", "output_layer": "elev_smooth",
                    "radius": 0.06}},
        {"name": "t", "type": "gridMapFilters/ThresholdFilter",
         "params": {"layer": "elev_smooth", "upper_threshold": 0.2, "set_to": 0.2}},
        {"name": "lo", "type": "gridMapFilters/MinInRadiusFilter",
         "params": {"input_layer": "elevation", "output_layer": "elev_min",
                    "radius": 0.06}},
        {"name": "hi", "type": "gridMapFilters/MaxInRadiusFilter",
         "params": {"input_layer": "elevation", "output_layer": "elev_max",
                    "radius": 0.06}},
        {"name": "rng", "type": "gridMapFilters/MathExpressionFilter",
         "params": {"output_layer": "local_range",
                    "expression": "elev_max - elev_min"}},
    ]
    out = chain_mod.compile_chain(specs, res)({"elevation": elev})

    e = np.asarray(elev)
    np.testing.assert_array_equal(np.asarray(out["elev_copy"]), e)

    # NumPy oracle for the window ops over the same circle offsets
    from traversability_estimation_tpu.grid.geometry import circle_offsets

    offs = circle_offsets(0.06, res).tolist()
    H, W = e.shape
    mean_ref = np.full_like(e, np.nan)
    min_ref = np.full_like(e, np.nan)
    max_ref = np.full_like(e, np.nan)
    for i in range(H):
        for j in range(W):
            vals = [
                e[i + di, j + dj]
                for di, dj in offs
                if 0 <= i + di < H and 0 <= j + dj < W
                and np.isfinite(e[i + di, j + dj])
            ]
            if vals:
                mean_ref[i, j] = np.mean(vals)
                min_ref[i, j] = np.min(vals)
                max_ref[i, j] = np.max(vals)
    np.testing.assert_allclose(
        np.asarray(out["elev_min"]), min_ref, atol=0, equal_nan=True
    )
    np.testing.assert_allclose(
        np.asarray(out["elev_max"]), max_ref, atol=0, equal_nan=True
    )
    np.testing.assert_allclose(
        np.asarray(out["elev_smooth"]),
        np.where(np.isfinite(mean_ref), np.minimum(mean_ref, 0.2), np.nan),
        rtol=1e-5,
        atol=1e-6,
        equal_nan=True,
    )
    np.testing.assert_allclose(
        np.asarray(out["local_range"]), max_ref - min_ref,
        rtol=1e-5, atol=1e-6, equal_nan=True,
    )


def test_register_custom_filter():
    def builder(spec, res):
        gain = float(spec.param("gain", 2.0))

        def apply(layers):
            out = dict(layers)
            out["scaled"] = layers["elevation"] * gain
            return out

        return apply

    chain_mod.register_filter("tests/ScaleFilter", builder)
    try:
        out = chain_mod.compile_chain(
            [{"name": "s", "type": "tests/ScaleFilter", "params": {"gain": 3.0}}], 0.03
        )({"elevation": jnp.ones((4, 4))})
        np.testing.assert_array_equal(np.asarray(out["scaled"]), 3.0)
    finally:
        chain_mod._REGISTRY.pop("tests/ScaleFilter", None)


# ---------------------------------------------------------------------------
# config routing + estimator integration
# ---------------------------------------------------------------------------


def test_reference_yaml_routes_to_fast_path():
    from traversability_estimation_tpu.utils.config import load_reference_config

    cfg = load_reference_config()
    assert cfg.filter_specs  # parsed and retained
    assert not cfg.use_generic_chain  # reference chain is canonical


@pytest.mark.slow
def test_inclination_gate_via_generic_chain():
    """checkInclination (TraversabilityMap.cpp:748-762) is dormant in the
    reference unless a configured chain produces `robot_slope` — with the
    generic chain a second SlopeFilter instance provides it, and paths
    crossing zero-robot-slope cells are gated even when the traversability
    chain itself passes."""
    import dataclasses

    from traversability_estimation_tpu.models import (
        FootprintPath,
        TraversabilityEstimator,
    )
    from traversability_estimation_tpu.utils.config import (
        EstimatorConfig,
        FootprintConfig,
    )

    res = 0.03
    specs = tuple(
        chain_mod.FilterSpec.from_dict(e)
        for e in [
            {"name": "n", "type": "gridMapFilters/NormalVectorsFilter",
             "params": {"radius": 0.05}},
            # permissive traversability: nothing vetoes
            {"name": "s", "type": "traversabilityFilters/SlopeFilter",
             "params": {"critical_value": 1.5}},
            {"name": "st", "type": "traversabilityFilters/StepFilter",
             "params": {"critical_value": 0.5, "first_window_radius": 0.04,
                        "second_window_radius": 0.04, "critical_cell_number": 4}},
            # strict robot inclination: steep band -> robot_slope == 0
            {"name": "rs", "type": "traversabilityFilters/SlopeFilter",
             "params": {"map_type": "robot_slope", "critical_value": 0.35}},
            {"name": "w", "type": "gridMapFilters/MathExpressionFilter",
             "params": {"output_layer": "traversability",
                        "expression": "0.5*(traversability_slope + traversability_step)"}},
        ]
    )
    cfg = EstimatorConfig(
        resolution=res,
        filter_specs=specs,
        use_generic_chain=True,
        footprint=FootprintConfig(check_robot_inclination=True),
    )
    est = TraversabilityEstimator(cfg)

    H = W = 64
    x = np.arange(H)[:, None] * res
    elev = np.broadcast_to(
        np.where((x > 0.8) & (x < 1.0), (x - 0.8) * 0.45, np.where(x >= 1.0, 0.09, 0.0)),
        (H, W),
    ).astype(np.float32)
    assert est.update(elev, position=(H * res / 2, W * res / 2))
    assert "robot_slope" in est.traversability_map.layers

    # path on the flat plain: passes
    flat = est.check_footprint_path(
        FootprintPath(poses=np.array([[0.2, 0.5], [0.2, 1.0]]), radius=0.05)
    )[0]
    # path crossing the steep band (x in [0.8, 1.0] -> slope atan(0.45)=0.42
    # > 0.35 critical -> robot_slope == 0): inclination-gated
    cross = est.check_footprint_path(
        FootprintPath(poses=np.array([[0.7, 0.9], [1.1, 0.9]]), radius=0.05)
    )[0]
    assert flat.is_safe
    assert not cross.is_safe

    # gate off -> the permissive chain lets the same path through
    cfg_off = dataclasses.replace(
        cfg, footprint=FootprintConfig(check_robot_inclination=False)
    )
    est.update_parameters(cfg_off)
    cross2 = est.check_footprint_path(
        FootprintPath(poses=np.array([[0.7, 0.9], [1.1, 0.9]]), radius=0.05)
    )[0]
    assert cross2.is_safe


def test_non_canonical_yaml_routes_to_generic(tmp_path):
    doc = {
        "traversability_map_filters": [
            {"name": "n", "type": "gridMapFilters/NormalVectorsFilter",
             "params": {"radius": 0.05}},
            {"name": "s", "type": "traversabilityFilters/SlopeFilter",
             "params": {"critical_value": 1.0}},
            {"name": "sm", "type": "gridMapFilters/MeanInRadiusFilter",
             "params": {"input_layer": "traversability_slope",
                        "output_layer": "traversability_slope", "radius": 0.06}},
            {"name": "w", "type": "gridMapFilters/MathExpressionFilter",
             "params": {"output_layer": "traversability",
                        "expression": "traversability_slope"}},
        ]
    }
    p = tmp_path / "filters.yaml"
    p.write_text(yaml.safe_dump(doc))

    from traversability_estimation_tpu.utils.config import load_config

    cfg = load_config(filter_yaml=str(p), resolution=0.03)
    assert cfg.use_generic_chain

    from traversability_estimation_tpu.models import TraversabilityEstimator

    est = TraversabilityEstimator(cfg)
    elev = synthetic_terrain(32, 32, 0.03, seed=9)
    assert est.update(elev)
    layers = est.traversability_map.layers
    assert "traversability" in layers and "traversability_slope" in layers
    trav = np.asarray(layers["traversability"])
    assert np.isfinite(trav).any()
    # smoothing actually happened: smoothed slope != raw slope layer
    raw = f_ops.run_chain_jit(
        jnp.asarray(elev), f_ops.ChainConfig(resolution=0.03)
    )["traversability_slope"]
    assert not np.array_equal(trav, np.asarray(raw), equal_nan=True)
    # queries still work against the generic-chain map
    safe, travs = est.check_circular_paths_batch(
        np.zeros((1, 1, 2), np.float32), np.ones((1,), np.int32), 0.1
    )
    assert safe.shape == (1,)
