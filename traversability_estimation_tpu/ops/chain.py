"""Declarative filter-chain framework — the pluginlib/FilterChain analog.

The reference composes its per-cell map pipeline from dynamically loaded
``filters::FilterBase<grid_map::GridMap>`` plugins configured as an ordered
name/type/params list (filter_plugins.xml:1-20, TraversabilityMap.cpp:129,
config/robot_filter_parameter.yaml). The TPU-native equivalent keeps the
declarative contract — the same YAML list, the same type names, the same
parameter names — but compiles the whole chain into ONE jitted XLA
computation over a dict of layer planes instead of dlopen'ing plugins:
"reconfigure" (TraversabilityMap.cpp:764-772) is simply re-compiling with a
new spec.

Supported filter types (reference chain + the grid_map_filters family the
chain list can name):

  gridMapFilters/NormalVectorsFilter      radius, input_layer, output_layers_prefix
  traversabilityFilters/SlopeFilter       critical_value, map_type
  traversabilityFilters/StepFilter        critical_value, first/second_window_radius,
                                          critical_cell_number, map_type
  traversabilityFilters/RoughnessFilter   critical_value, estimation_radius, map_type
  gridMapFilters/MathExpressionFilter     expression, output_layer  (safe compiler,
                                          ops/expr.py — no eval)
  gridMapFilters/DeletionFilter           layers
  gridMapFilters/DuplicationFilter        input_layer, output_layer
  gridMapFilters/ThresholdFilter          layer/condition_layer(+output_layer),
                                          lower/upper_threshold, set_to
  gridMapFilters/MeanInRadiusFilter       input_layer, output_layer, radius
  gridMapFilters/MinInRadiusFilter        input_layer, output_layer, radius
  gridMapFilters/MaxInRadiusFilter        input_layer, output_layer, radius
  gridMapFilters/SetBasicLayersFilter     layers (metadata no-op here)

Unknown types raise at compile time, like pluginlib's load failure.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp

from traversability_estimation_tpu.ops import expr as expr_mod
from traversability_estimation_tpu.ops import filters as f_ops
from traversability_estimation_tpu.grid.geometry import circle_offsets

Array = jnp.ndarray
Layers = Dict[str, Array]


def _freeze(value):
    """Recursively convert YAML params into hashable static values."""
    if isinstance(value, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in value.items()))
    if isinstance(value, (list, tuple)):
        return tuple(_freeze(v) for v in value)
    return value


@dataclasses.dataclass(frozen=True)
class FilterSpec:
    """One chain entry: the reference's {name, type, params} YAML item,
    frozen/hashable so a chain of specs can be a static jit argument."""

    name: str
    type: str
    params: Tuple[Tuple[str, object], ...] = ()

    @staticmethod
    def from_dict(entry: Mapping) -> "FilterSpec":
        return FilterSpec(
            name=str(entry.get("name", "")),
            type=str(entry.get("type", "")),
            params=_freeze(entry.get("params", {}) or {}),
        )

    def param(self, key: str, default=None):
        for k, v in self.params:
            if k == key:
                return v
        return default


class ChainCompileError(ValueError):
    """Unknown filter type or missing required parameter (the analog of a
    pluginlib load/configure failure)."""


# --- individual filter builders -------------------------------------------
# Each builder: (spec, resolution) -> Callable[[Layers], Layers]


def _normal_vectors(spec: FilterSpec, res: float):
    radius = float(spec.param("radius", 0.05))
    in_layer = str(spec.param("input_layer", "elevation"))
    prefix = str(spec.param("output_layers_prefix", "surface_normal_"))

    def apply(layers: Layers) -> Layers:
        normals = f_ops.surface_normals(layers[in_layer], res, radius)
        out = dict(layers)
        out[prefix + "x"] = normals["surface_normal_x"]
        out[prefix + "y"] = normals["surface_normal_y"]
        out[prefix + "z"] = normals["surface_normal_z"]
        return out

    return apply


def _slope(spec: FilterSpec, res: float):
    critical = float(spec.param("critical_value", 0.3))
    out_layer = str(spec.param("map_type", "traversability_slope"))

    def apply(layers: Layers) -> Layers:
        nz = layers.get("surface_normal_z")
        if nz is None:
            raise ChainCompileError(
                "SlopeFilter requires surface normals earlier in the chain "
                "(reference: SlopeFilter.cpp:67 reads surface_normal_z)"
            )
        out = dict(layers)
        out[out_layer] = f_ops.slope_from_normals(nz, critical)
        return out

    return apply


def _step(spec: FilterSpec, res: float):
    out_layer = str(spec.param("map_type", "traversability_step"))
    critical = float(spec.param("critical_value", 0.3))
    w1 = float(spec.param("first_window_radius", 0.08))
    w2 = float(spec.param("second_window_radius", 0.08))
    ncrit = int(spec.param("critical_cell_number", 5))

    def apply(layers: Layers) -> Layers:
        out = dict(layers)
        out[out_layer] = f_ops.step_layer(
            layers["elevation"], res, critical, w1, w2, ncrit
        )
        return out

    return apply


def _roughness(spec: FilterSpec, res: float):
    out_layer = str(spec.param("map_type", "traversability_roughness"))
    critical = float(spec.param("critical_value", 0.3))
    radius = float(spec.param("estimation_radius", 0.3))

    def apply(layers: Layers) -> Layers:
        normals = {
            "surface_normal_x": layers["surface_normal_x"],
            "surface_normal_y": layers["surface_normal_y"],
            "surface_normal_z": layers["surface_normal_z"],
        }
        out = dict(layers)
        out[out_layer] = f_ops.roughness_layer(
            layers["elevation"], normals, res, critical, radius
        )
        return out

    return apply


def _math_expression(spec: FilterSpec, res: float):
    out_layer = str(spec.param("output_layer", "traversability"))
    src = str(spec.param("expression", ""))
    if not src:
        raise ChainCompileError(f"MathExpressionFilter {spec.name!r}: empty expression")
    ast = expr_mod.parse(src)

    def apply(layers: Layers) -> Layers:
        out = dict(layers)
        out[out_layer] = expr_mod.evaluate(ast, layers).astype(jnp.float32)
        return out

    return apply


def _deletion(spec: FilterSpec, res: float):
    victims = tuple(str(v) for v in (spec.param("layers", ()) or ()))

    def apply(layers: Layers) -> Layers:
        return {k: v for k, v in layers.items() if k not in victims}

    return apply


def _duplication(spec: FilterSpec, res: float):
    in_layer = str(spec.param("input_layer", ""))
    out_layer = str(spec.param("output_layer", ""))
    if not in_layer or not out_layer:
        raise ChainCompileError(f"DuplicationFilter {spec.name!r}: need input/output")

    def apply(layers: Layers) -> Layers:
        out = dict(layers)
        out[out_layer] = layers[in_layer]
        return out

    return apply


def _threshold(spec: FilterSpec, res: float):
    # grid_map ThresholdFilter: where condition layer crosses the threshold,
    # write set_to into the output layer (condition defaults to the output).
    layer = str(spec.param("condition_layer", spec.param("layer", "")))
    out_layer = str(spec.param("output_layer", layer))
    lower = spec.param("lower_threshold")
    upper = spec.param("upper_threshold")
    set_to = float(spec.param("set_to", 0.0))
    if not layer or (lower is None and upper is None):
        raise ChainCompileError(
            f"ThresholdFilter {spec.name!r}: need layer and lower/upper_threshold"
        )

    def apply(layers: Layers) -> Layers:
        cond = layers[layer]
        target = layers.get(out_layer, cond)
        hit = jnp.zeros(cond.shape, bool)
        if lower is not None:
            hit = hit | (cond < jnp.float32(float(lower)))
        if upper is not None:
            hit = hit | (cond > jnp.float32(float(upper)))
        out = dict(layers)
        out[out_layer] = jnp.where(hit, jnp.float32(set_to), target)
        return out

    return apply


def _in_radius(reduction: str):
    def build(spec: FilterSpec, res: float):
        in_layer = str(spec.param("input_layer", "elevation"))
        out_layer = str(spec.param("output_layer", in_layer))
        radius = float(spec.param("radius", res))
        offs = circle_offsets(radius, res).tolist()

        def apply(layers: Layers) -> Layers:
            src = layers[in_layer].astype(jnp.float32)
            valid = jnp.isfinite(src)
            if reduction == "mean":
                acc = jnp.zeros_like(src)
                cnt = jnp.zeros_like(src)
                zf = jnp.where(valid, src, 0.0)
                vf = valid.astype(jnp.float32)
                for di, dj in offs:
                    acc = acc + f_ops._shifted(zf, di, dj, 0.0)
                    cnt = cnt + f_ops._shifted(vf, di, dj, 0.0)
                res_plane = acc / jnp.where(cnt > 0, cnt, jnp.nan)
            else:
                neutral = f_ops._POS if reduction == "min" else f_ops._NEG
                op = jnp.minimum if reduction == "min" else jnp.maximum
                acc = jnp.full_like(src, neutral)
                any_v = jnp.zeros(src.shape, bool)
                filled = jnp.where(valid, src, neutral)
                for di, dj in offs:
                    acc = op(acc, f_ops._shifted(filled, di, dj, neutral))
                    any_v = any_v | f_ops._shifted(valid, di, dj, False)
                res_plane = jnp.where(any_v, acc, jnp.nan)
            out = dict(layers)
            out[out_layer] = res_plane.astype(jnp.float32)
            return out

        return apply

    return build


def _set_basic_layers(spec: FilterSpec, res: float):
    def apply(layers: Layers) -> Layers:  # metadata-only in grid_map
        return layers

    return apply


_REGISTRY: Dict[str, Callable[[FilterSpec, float], Callable[[Layers], Layers]]] = {
    "gridMapFilters/NormalVectorsFilter": _normal_vectors,
    "traversabilityFilters/SlopeFilter": _slope,
    "traversabilityFilters/StepFilter": _step,
    "traversabilityFilters/RoughnessFilter": _roughness,
    "gridMapFilters/MathExpressionFilter": _math_expression,
    "gridMapFilters/DeletionFilter": _deletion,
    "gridMapFilters/DuplicationFilter": _duplication,
    "gridMapFilters/ThresholdFilter": _threshold,
    "gridMapFilters/MeanInRadiusFilter": _in_radius("mean"),
    "gridMapFilters/MinInRadiusFilter": _in_radius("min"),
    "gridMapFilters/MaxInRadiusFilter": _in_radius("max"),
    "gridMapFilters/SetBasicLayersFilter": _set_basic_layers,
}


def register_filter(type_name: str, builder) -> None:
    """Extension point: the analog of exporting a new pluginlib plugin."""
    _REGISTRY[type_name] = builder


def available_filters() -> Tuple[str, ...]:
    return tuple(sorted(_REGISTRY))


def compile_chain(
    specs: Sequence[FilterSpec | Mapping], resolution: float
) -> Callable[[Layers], Layers]:
    """Compile an ordered spec list into one composite layers->layers
    function (trace-time composition — XLA fuses across filter boundaries,
    which pluginlib's virtual-dispatch chain never could)."""
    built = []
    for entry in specs:
        spec = entry if isinstance(entry, FilterSpec) else FilterSpec.from_dict(entry)
        builder = _REGISTRY.get(spec.type)
        if builder is None:
            raise ChainCompileError(
                f"unknown filter type {spec.type!r} (filter {spec.name!r}); "
                f"known: {available_filters()}"
            )
        built.append(builder(spec, resolution))

    def chain(layers: Layers) -> Layers:
        out = dict(layers)
        for fn in built:
            out = fn(out)
        return out

    return chain


@partial(jax.jit, static_argnums=(1, 2))
def run_spec_chain_jit(
    layers: Layers, specs: Tuple[FilterSpec, ...], resolution: float
) -> Layers:
    """Jitted generic chain; (specs, resolution) static — each distinct chain
    configuration compiles once, like the reference configuring its
    FilterChain once per reconfigure (TraversabilityMap.cpp:764-772)."""
    return compile_chain(specs, resolution)(layers)
