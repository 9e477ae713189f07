"""Typed configuration with reference-YAML compatibility.

The reference configures itself from three YAML files via rosparam
(/root/reference/traversability_estimation/config/robot.yaml,
robot_filter_parameter.yaml, robot_footprint_parameter.yaml, loaded by
launch/traversability_estimation.launch:3-7). This module reads those exact
files (same parameter names, same filter-chain list format) into typed
dataclasses, and supports hot-reload by rebuilding the jitted chain — the
analog of the reference's ``update_parameters`` service
(TraversabilityEstimation.cpp:224-246).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import yaml

from traversability_estimation_tpu.ops.chain import FilterSpec
from traversability_estimation_tpu.ops.filters import ChainConfig
from traversability_estimation_tpu.ops.veto import VetoConfig

# chain shapes the fused fast path (ops/filters.run_chain) reproduces exactly:
# at most one of each canonical filter, normals first, default output names
_CANONICAL_TYPES = {
    "gridMapFilters/NormalVectorsFilter",
    "traversabilityFilters/SlopeFilter",
    "traversabilityFilters/StepFilter",
    "traversabilityFilters/RoughnessFilter",
    "gridMapFilters/MathExpressionFilter",
    "gridMapFilters/DeletionFilter",
}
_DEFAULT_OUTPUTS = {
    "traversabilityFilters/SlopeFilter": "traversability_slope",
    "traversabilityFilters/StepFilter": "traversability_step",
    "traversabilityFilters/RoughnessFilter": "traversability_roughness",
}


_CANONICAL_ORDER = (
    "gridMapFilters/NormalVectorsFilter",
    "traversabilityFilters/SlopeFilter",
    "traversabilityFilters/StepFilter",
    "traversabilityFilters/RoughnessFilter",
    "gridMapFilters/MathExpressionFilter",
    "gridMapFilters/DeletionFilter",
)
_NORMAL_LAYERS = {"surface_normal_x", "surface_normal_y", "surface_normal_z"}


def _is_canonical(specs: Sequence[FilterSpec]) -> bool:
    """True ONLY when the fused fast path (ChainConfig) represents this chain
    exactly: each canonical filter at most once, in the reference order
    (the fused path computes normals -> slope -> step -> roughness ->
    fusion regardless of the list), default layer names, and a Deletion
    stage that drops nothing but the normals (the fused path never persists
    them anyway). Anything else routes through the generic compiled chain."""
    order_pos = -1
    for s in specs:
        if s.type not in _CANONICAL_TYPES:
            return False
        pos = _CANONICAL_ORDER.index(s.type)
        if pos <= order_pos:  # out of order or duplicate
            return False
        order_pos = pos
        if s.type == "gridMapFilters/NormalVectorsFilter":
            if s.param("input_layer", "elevation") != "elevation" or s.param(
                "output_layers_prefix", "surface_normal_"
            ) != "surface_normal_":
                return False
        elif s.type in _DEFAULT_OUTPUTS:
            if s.param("map_type", _DEFAULT_OUTPUTS[s.type]) != _DEFAULT_OUTPUTS[s.type]:
                return False
        elif s.type == "gridMapFilters/MathExpressionFilter":
            if s.param("output_layer", "traversability") != "traversability":
                return False
        elif s.type == "gridMapFilters/DeletionFilter":
            victims = set(str(v) for v in (s.param("layers", ()) or ()))
            if not victims <= _NORMAL_LAYERS:
                return False
    return True


@dataclasses.dataclass(frozen=True)
class FootprintConfig:
    """footprint/* parameters (robot_footprint_parameter.yaml)."""

    footprint_polygon: Tuple[Tuple[float, float], ...] = (
        (0.45, 0.30),
        (0.45, -0.30),
        (-0.45, -0.30),
        (-0.45, 0.30),
    )
    circular_footprint_radius: float = 0.541
    circular_footprint_radius_inscribed: float = 0.30
    circular_footprint_offset: float = 0.15
    footprint_frame_id: str = "base"
    traversability_default: float = 0.5
    verify_roughness_footprint: bool = False
    check_robot_inclination: bool = False


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    """Top-level config: node params + filter chain + footprint."""

    resolution: float = 0.03
    map_frame_id: str = "map"
    robot_frame_id: str = "base"
    min_update_rate: float = 1.0  # TraversabilityEstimation.cpp:85 default
    map_length: Tuple[float, float] = (4.0, 4.0)  # robot.yaml map_length_x/y
    map_center: Tuple[float, float] = (0.0, 0.0)
    footprint_yaw: float = 1.5708  # code default M_PI_2
    max_gap_width: float = 0.3
    use_raw_map: bool = False
    chain: ChainConfig = None  # type: ignore[assignment]
    footprint: FootprintConfig = dataclasses.field(default_factory=FootprintConfig)
    # full declarative chain spec (ops/chain.py). When `use_generic_chain` is
    # set (a configured chain the fused fast path cannot represent), map
    # updates run the compiled generic chain instead of ops/filters.run_chain;
    # `chain` still carries the best-effort extracted parameters for the veto
    # cascade (critical step height etc.).
    filter_specs: Tuple[FilterSpec, ...] = ()
    use_generic_chain: bool = False

    def __post_init__(self):
        if self.chain is None:
            object.__setattr__(self, "chain", ChainConfig(resolution=self.resolution))

    @property
    def veto(self) -> VetoConfig:
        return VetoConfig(
            resolution=self.chain.resolution,
            critical_step_height=self.chain.step_critical_value,
            max_gap_width=self.max_gap_width,
            check_roughness=self.footprint.verify_roughness_footprint,
        )

    @property
    def elevation_layers(self) -> Tuple[str, ...]:
        # TraversabilityMap::createLayers (TraversabilityMap.cpp:64-77)
        if self.use_raw_map:
            return (
                "elevation",
                "variance",
                "horizontal_variance_x",
                "horizontal_variance_y",
                "horizontal_variance_xy",
                "time",
            )
        return ("elevation", "upper_bound", "lower_bound")


def _chain_from_filter_list(filters: Sequence[dict], resolution: float) -> ChainConfig:
    """Build a ChainConfig from the reference's traversability_map_filters
    list (name/type/params entries, robot_filter_parameter.yaml)."""
    kw: Dict[str, object] = {"resolution": resolution}
    fusion_expression: Optional[str] = None
    for entry in filters:
        ftype = entry.get("type", "")
        params = entry.get("params", {}) or {}
        if ftype.endswith("NormalVectorsFilter"):
            kw["normals_radius"] = float(params.get("radius", 0.05))
        elif ftype.endswith("SlopeFilter"):
            kw["slope_critical_value"] = float(params.get("critical_value", 1.0))
        elif ftype.endswith("StepFilter"):
            kw["step_critical_value"] = float(params.get("critical_value", 0.12))
            kw["step_first_window_radius"] = float(
                params.get("first_window_radius", 0.04)
            )
            kw["step_second_window_radius"] = float(
                params.get("second_window_radius", 0.04)
            )
            kw["step_critical_cell_number"] = int(
                params.get("critical_cell_number", 4)
            )
        elif ftype.endswith("RoughnessFilter"):
            kw["roughness_critical_value"] = float(params.get("critical_value", 0.3))
            kw["roughness_estimation_radius"] = float(
                params.get("estimation_radius", 0.3)
            )
        elif ftype.endswith("MathExpressionFilter"):
            fusion_expression = str(params.get("expression", ""))
        # DeletionFilter: no-op — normals never persist unless asked for
    if fusion_expression:
        kw["fusion_expression"] = fusion_expression
    return ChainConfig(**kw)


def load_config(
    robot_yaml: Optional[str] = None,
    filter_yaml: Optional[str] = None,
    footprint_yaml: Optional[str] = None,
    resolution: float = 0.03,
    base: Optional["EstimatorConfig"] = None,
) -> EstimatorConfig:
    """Load an EstimatorConfig from reference-format YAML files. Any file may
    be omitted. With `base` (hot-reload path), parameters the files do not
    mention keep the base config's values — rosparam-load semantics; without
    it, defaults match the reference code defaults."""
    robot = {}
    if robot_yaml:
        with open(robot_yaml) as f:
            robot = yaml.safe_load(f) or {}
    filters = []
    if filter_yaml:
        with open(filter_yaml) as f:
            fdoc = yaml.safe_load(f) or {}
        filters = fdoc.get("traversability_map_filters", [])
    fp_doc = {}
    if footprint_yaml:
        with open(footprint_yaml) as f:
            fp_doc = (yaml.safe_load(f) or {}).get("footprint", {})

    if base is not None:
        resolution = base.resolution
    bf = base.footprint if base is not None else FootprintConfig()

    if filters:
        chain = _chain_from_filter_list(filters, resolution)
        specs = tuple(FilterSpec.from_dict(e) for e in filters)
        generic = bool(specs) and not _is_canonical(specs)
    elif base is not None:
        chain = base.chain
        specs = base.filter_specs
        generic = base.use_generic_chain
    else:
        chain = _chain_from_filter_list([], resolution)
        specs = ()
        generic = False

    footprint = FootprintConfig(
        footprint_polygon=tuple(
            tuple(p)
            for p in fp_doc.get("footprint_polygon", bf.footprint_polygon)
        ),
        circular_footprint_radius=float(
            fp_doc.get("circular_footprint_radius", bf.circular_footprint_radius)
        ),
        circular_footprint_radius_inscribed=float(
            fp_doc.get(
                "circular_footprint_radius_inscribed",
                bf.circular_footprint_radius_inscribed,
            )
        ),
        circular_footprint_offset=float(
            fp_doc.get("circular_footprint_offset", bf.circular_footprint_offset)
        ),
        footprint_frame_id=str(
            fp_doc.get("footprint_frame_id", bf.footprint_frame_id)
        ),
        traversability_default=float(
            fp_doc.get("traversability_default", bf.traversability_default)
        ),
        verify_roughness_footprint=bool(
            fp_doc.get("verify_roughness_footprint", bf.verify_roughness_footprint)
        ),
        check_robot_inclination=bool(
            fp_doc.get("check_robot_inclination", bf.check_robot_inclination)
        ),
    )
    b = base if base is not None else EstimatorConfig(resolution=resolution)
    return EstimatorConfig(
        resolution=resolution,
        map_frame_id=str(robot.get("map_frame_id", b.map_frame_id)),
        robot_frame_id=str(robot.get("robot_frame_id", b.robot_frame_id)),
        min_update_rate=float(robot.get("min_update_rate", b.min_update_rate)),
        map_length=(
            float(robot.get("map_length_x", b.map_length[0])),
            float(robot.get("map_length_y", b.map_length[1])),
        ),
        map_center=(
            float(robot.get("map_center_x", b.map_center[0])),
            float(robot.get("map_center_y", b.map_center[1])),
        ),
        footprint_yaw=float(robot.get("footprint_yaw", b.footprint_yaw)),
        max_gap_width=float(robot.get("max_gap_width", b.max_gap_width)),
        use_raw_map=bool(robot.get("use_raw_map", b.use_raw_map)),
        chain=chain,
        footprint=footprint,
        filter_specs=specs,
        use_generic_chain=generic,
    )


REFERENCE_CONFIG_DIR = "/root/reference/traversability_estimation/config"


def load_reference_config(resolution: float = 0.03) -> EstimatorConfig:
    """Convenience: load the reference's shipped robot configuration."""
    return load_config(
        robot_yaml=f"{REFERENCE_CONFIG_DIR}/robot.yaml",
        filter_yaml=f"{REFERENCE_CONFIG_DIR}/robot_filter_parameter.yaml",
        footprint_yaml=f"{REFERENCE_CONFIG_DIR}/robot_footprint_parameter.yaml",
        resolution=resolution,
    )
