"""Dense per-cell veto fields — the reference's lazy query caches, inverted.

The reference answers footprint queries through a veto cascade
``isTraversableForFilters`` (slope -> step -> roughness,
/root/reference/traversability_estimation/src/TraversabilityMap.cpp:774-921)
computed lazily per queried cell and memoized into ``*_footprint`` layers.
Each cell's verdict is a pure function of the map layers, so on TPU we compute
the whole field densely, once per map update: every window scan becomes a
static-offset shifted reduction and the step filter's data-dependent gap walk
becomes a bounded set of ray analyses (8 directions x <= ceil(max_gap/res)
steps) evaluated for all cells at once. Queries then reduce to gathers over
boolean planes.

Dense != lazy only in WHEN work happens; per-cell verdicts are identical
(validated cell-by-cell against the oracle's faithful lazy implementation).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from traversability_estimation_tpu.grid.geometry import circle_offsets
from traversability_estimation_tpu.ops.filters import _shifted

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class VetoConfig:
    resolution: float
    critical_step_height: float = 0.12  # stepFilter critical_value (robot_filter_parameter.yaml)
    max_gap_width: float = 0.3  # robot.yaml max_gap_width
    check_roughness: bool = False  # footprint/verify_roughness_footprint

    @property
    def slope_n_critical(self) -> int:
        # TraversabilityMap.cpp:871-873
        window_radius = 3.0 * self.resolution
        critical_length = self.max_gap_width / 3.0
        return math.floor(2.0 * window_radius * critical_length / self.resolution**2)

    @property
    def roughness_n_critical(self) -> int:
        # TraversabilityMap.cpp:899-901 (factor 1.5)
        window_radius = 3.0 * self.resolution
        critical_length = self.max_gap_width / 3.0
        return math.floor(1.5 * window_radius * critical_length / self.resolution**2)


def _count_veto_ok(layer: Array, resolution: float, n_critical: int) -> Array:
    """checkForSlope/checkForRoughness pattern: a zero cell fails iff the
    count of zero cells in a 3*res circle exceeds n_critical.

    The disc count decomposes by rows: a horizontal box sum per DISTINCT row
    span (disc rows are contiguous dj ranges; the 3-cell disc has spans of
    width 7, 5, 1), then a vertical combine of row-shifted box sums — 16
    plane shifts instead of 29, most in the cheap row direction. Counts are
    small integers accumulated in f32, so any grouping is exact; measured
    3.6x faster than the direct 29-shift accumulation and verdict-identical
    on chip (ABLATE_last.json E8). NaN layer values compare False into
    ``is_zero`` exactly as in the reference."""
    is_zero = layer == 0.0  # NaN compares False
    zf = is_zero.astype(jnp.float32)
    rows: Dict[int, List[int]] = {}
    for di, dj in circle_offsets(3.0 * resolution, resolution).tolist():
        rows.setdefault(int(di), []).append(int(dj))
    box_cache: Dict[Tuple[int, int], Array] = {}
    count = jnp.zeros_like(zf)
    for di in sorted(rows):
        djs = sorted(rows[di])
        assert djs == list(range(djs[0], djs[-1] + 1)), "disc rows contiguous"
        key = (djs[0], djs[-1])
        if key not in box_cache:
            acc = jnp.zeros_like(zf)
            for dj in range(key[0], key[1] + 1):
                acc = acc + (zf if dj == 0 else _shifted(zf, 0, dj, 0.0))
            box_cache[key] = acc
        b = box_cache[key]
        count = count + (b if di == 0 else _shifted(b, di, 0, 0.0))
    fail = is_zero & (count > jnp.float32(n_critical))
    return ~fail


def _ray_directions(cfg: VetoConfig) -> List[Tuple[int, int, int]]:
    """(di, dj, K) for the 8 submap walk directions; K = number of line cells
    beyond the candidate (walk end offset = K * d). Mirrors the C++ walk bound
    ``(k+1)*|vec| < max_gap_width`` with |vec| = |d| * res
    (TraversabilityMap.cpp:829-834). Directions with |d|*res < 0.025 are
    skipped by the reference's minimum-vector guard."""
    out = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            step_len = math.hypot(di, dj) * cfg.resolution
            if step_len < 0.025:
                continue
            k = max(1, math.ceil(cfg.max_gap_width / step_len - 1e-12) - 1)
            out.append((di, dj, k))
    return out


def step_veto_ok(
    elevation: Array,
    step_layer: Array,
    cfg: VetoConfig,
    in_map: Optional[Array] = None,
) -> Array:
    """checkForStep (TraversabilityMap.cpp:794-865) as a dense field —
    round-5 sentinel-folded formulation.

    Cell-exact with :func:`step_veto_ok_v1` (tested; chip agree-check in
    ABLATE E12) but reads ~104 shifted planes instead of ~236:

    - ``selev`` = elevation where the cell is a legal drop/candidate cell
      (step == 0, inside the global map), NaN otherwise. One shifted compare
      against it replaces the old (elev, in_map, step0) TRIPLE of shifted
      planes for both the trigger test and the candidate-window test — and
      the 8 trigger offsets are a subset of the 2.5*res candidate disc, so
      XLA CSE shares those shifts outright.
    - ``welev`` = elevation with in-map-invalid cells coded -inf ("gap") and
      out-of-global cells coded NaN ("walk ends"); the walk reads ONE
      shifted plane per (direction, step) instead of two, and the
      wall/gap/active states are three compares on it (NaN compares false
      everywhere, so out-of-map is never wall/gap/mid — exactly the
      reference's prefix-closed line iteration).

    Per cell q with step == 0: candidate cells c in a 2.5*res circle that
    are higher than q by the critical step (fallback: q itself); per
    candidate, 8 bounded ray walks relative to the candidate's elevation; a
    ray FAILS on a blocking wall before the gap closes, or on a gap that
    never closes within max_gap_width. q is untraversable iff any active
    (candidate, ray) fails.

    `in_map` marks cells inside the GLOBAL map (all True for an unsharded
    map — in that case the border coding comes free from the shift fill
    value and no in_map plane exists at all).
    """
    elev = elevation.astype(jnp.float32)
    step0 = step_layer == 0.0
    crit = jnp.float32(cfg.critical_step_height)

    if in_map is None:
        selev = jnp.where(step0, elev, jnp.nan)
        welev = jnp.where(jnp.isfinite(elev), elev, -jnp.inf)
    else:
        selev = jnp.where(step0 & in_map, elev, jnp.nan)
        welev = jnp.where(
            in_map,
            jnp.where(jnp.isfinite(elev), elev, -jnp.inf),
            jnp.nan,
        )

    dirs = _ray_directions(cfg)

    # --- per-cell, per-direction ray analysis (thresholds rel. to own cell) -
    ray_fail = []
    for di, dj, K in dirs:
        h = elev
        # direction triggers iff neighbor (the submap drop cell) exists, has
        # step == 0, and is lower than the candidate by > critical — one
        # shifted read of the sentinel plane (NaN compares false).
        trigger = _shifted(selev, di, dj, jnp.nan) < h - crit

        gap_started = jnp.zeros(elev.shape, dtype=bool)
        ended = jnp.zeros(elev.shape, dtype=bool)
        wall_fail = jnp.zeros(elev.shape, dtype=bool)
        any_gap = jnp.zeros(elev.shape, dtype=bool)
        for t in range(1, K + 1):
            w_t = _shifted(welev, di * t, dj * t, jnp.nan)
            wall_t = w_t > h + crit          # NaN/-inf -> False
            gap_t = w_t < h - crit           # -inf -> True, NaN -> False
            mid_t = ~jnp.isnan(w_t) & ~wall_t & ~gap_t
            end_t = mid_t & gap_started & ~ended
            # wall cells checked only until the loop breaks at the gap end
            wall_fail = wall_fail | (wall_t & ~ended)
            any_gap = any_gap | (gap_t & ~ended)
            gap_started = gap_started | gap_t
            ended = ended | end_t
        unclosed = any_gap & ~ended
        ray_fail.append(trigger & (wall_fail | unclosed))

    # --- candidate window combine ---------------------------------------
    # allowed walk directions: toCenter . vec >= 0  <=>  o . d <= 0; the
    # filter is skipped when |toCenter| <= 0.025 (TraversabilityMap.cpp:
    # 830-831). Sector-grouped OR planes as in round 4 (ABLATE E11); the
    # (0,0) offset can never be an ACTIVE candidate (elev > elev + crit is
    # false, NaN-sentinel included) so it is skipped outright.
    cand_offs = circle_offsets(2.5 * cfg.resolution, cfg.resolution)
    sectors: Dict[Tuple[int, ...], List[Tuple[int, int]]] = {}
    for o in cand_offs.tolist():
        oi, oj = int(o[0]), int(o[1])
        if oi == 0 and oj == 0:
            continue
        to_center_small = math.hypot(oi, oj) * cfg.resolution <= 0.025
        allowed = tuple(
            d_idx for d_idx, (di, dj, _) in enumerate(dirs)
            if to_center_small or (oi * di + oj * dj) <= 0
        )
        sectors.setdefault(allowed, []).append((oi, oj))
    sector_f32: Dict[Tuple[int, ...], Array] = {}
    for allowed in sectors:
        acc = jnp.zeros(elev.shape, dtype=bool)
        for d_idx in allowed:
            acc = acc | ray_fail[d_idx]
        sector_f32[allowed] = acc.astype(jnp.float32)

    has_cand = jnp.zeros(elev.shape, dtype=bool)
    fail_from_cand = jnp.zeros(elev.shape, dtype=bool)
    for allowed, offs in sectors.items():
        plane = sector_f32[allowed]
        for oi, oj in offs:
            active = _shifted(selev, oi, oj, jnp.nan) > elev + crit
            has_cand = has_cand | active
            fail_from_cand = fail_from_cand | (
                active & (_shifted(plane, oi, oj, 0.0) > 0.5)
            )

    # self-fallback (no candidate): all directions allowed, relative to self
    fail_self = jnp.zeros(elev.shape, dtype=bool)
    for rf in ray_fail:
        fail_self = fail_self | rf

    # fail_from_cand implies has_cand, so the (has_cand & .) guard is free;
    # logical ops, not jnp.where: Mosaic cannot lower select on i1 vectors
    fail = step0 & (fail_from_cand | (~has_cand & fail_self))
    return ~fail


def step_veto_ok_v1(
    elevation: Array,
    step_layer: Array,
    cfg: VetoConfig,
    in_map: Optional[Array] = None,
) -> Array:
    """checkForStep (TraversabilityMap.cpp:794-865) as a dense field.

    Round-4 production formulation, retained verbatim as the A/B referee for
    the sentinel-folded :func:`step_veto_ok` (chip rows in ABLATE E12; the
    two are asserted cell-identical in tests/test_veto.py).

    Per cell q with step == 0: candidate cells c in a 2.5*res circle that are
    higher than q by the critical step (fallback: q itself); per candidate, 8
    bounded ray walks relative to the candidate's elevation; a ray FAILS on a
    blocking wall before the gap closes, or on a gap that never closes within
    max_gap_width. q is untraversable iff any active (candidate, ray) fails.

    `in_map` marks cells inside the GLOBAL map (all True for an unsharded
    map). Needed because out-of-map cells terminate the reference's gap walk
    rather than reading as invalid ("gap") cells — on a sharded tile the halo
    contains real out-of-tile data plus out-of-global padding, and only the
    latter must stop the walk.
    """
    # NOTE on a measured negative result (round 4): a "packed" variant of
    # this function — one NaN-sentinel plane (step0 + in_map + elevation)
    # serving all trigger/candidate tests, folded gap compare, and the 8
    # per-direction fail planes bit-packed into one int32 plane so the
    # candidate combine shifts 21 planes instead of ~84 bool planes — was
    # implemented, verified cell-exact, and measured 1.5x SLOWER than this
    # formulation on the chip (0.115 vs 0.076 ms at 336^2, clean A/B in
    # ABLATE_last.json E7). XLA fuses the bool-plane combine better than
    # the int32 select/or/and chain. Keep the bool formulation.
    elev = elevation.astype(jnp.float32)
    step0 = step_layer == 0.0
    crit = jnp.float32(cfg.critical_step_height)
    if in_map is None:
        in_map = jnp.ones(elev.shape, dtype=bool)

    dirs = _ray_directions(cfg)

    # --- per-cell, per-direction ray analysis (thresholds rel. to own cell) -
    ray_fail = []
    for di, dj, K in dirs:
        h = elev
        # direction triggers iff neighbor (the submap drop cell) exists, has
        # step == 0, and is lower than the candidate by > critical
        nb_elev = _shifted(elev, di, dj, jnp.nan)
        nb_in = _shifted(in_map, di, dj, False)
        nb_step0 = _shifted(step0, di, dj, False)
        trigger = nb_in & nb_step0 & (nb_elev < h - crit)

        gap_started = jnp.zeros(elev.shape, dtype=bool)
        ended = jnp.zeros(elev.shape, dtype=bool)
        wall_fail = jnp.zeros(elev.shape, dtype=bool)
        any_gap = jnp.zeros(elev.shape, dtype=bool)
        for t in range(1, K + 1):
            e_t = _shifted(elev, di * t, dj * t, jnp.nan)
            t_in = _shifted(in_map, di * t, dj * t, False)
            active = t_in  # walk stops at the map edge; rays are prefix-closed
            wall_t = active & (e_t > h + crit)
            gap_t = active & ((e_t < h - crit) | ~jnp.isfinite(e_t))
            mid_t = active & ~wall_t & ~gap_t
            end_t = mid_t & gap_started & ~ended
            # wall cells checked only until the loop breaks at the gap end
            wall_fail = wall_fail | (wall_t & ~ended)
            any_gap = any_gap | (gap_t & ~ended)
            gap_started = gap_started | gap_t
            ended = ended | end_t
        unclosed = any_gap & ~ended
        ray_fail.append(trigger & (wall_fail | unclosed))

    # --- candidate window combine ---------------------------------------
    # allowed walk directions: toCenter . vec >= 0  <=>  o . d <= 0
    # (position axes are index axes negated); the filter is skipped when
    # |toCenter| = |o|*res <= 0.025 (TraversabilityMap.cpp:830-831).
    # The allowed-direction set takes only ~9 distinct values over the
    # candidate disc (one per angular sector + the center), so the combine
    # ORs the member ray_fail planes ONCE per sector, converts to f32 once,
    # and shifts the combined plane per offset — ~21 shifted reads instead
    # of ~84 per-(offset, direction) bool shifts. Measured 14% faster on
    # the walk, cell-exact (ABLATE_last.json E11; an int32 bit-pack attempt
    # at the same reduction lost 1.5x — E7 — XLA fuses bool/f32 better).
    cand_offs = circle_offsets(2.5 * cfg.resolution, cfg.resolution)
    sectors: Dict[Tuple[int, ...], List[Tuple[int, int]]] = {}
    for o in cand_offs.tolist():
        oi, oj = int(o[0]), int(o[1])
        to_center_small = math.hypot(oi, oj) * cfg.resolution <= 0.025
        allowed = tuple(
            d_idx for d_idx, (di, dj, _) in enumerate(dirs)
            if to_center_small or (oi * di + oj * dj) <= 0
        )
        sectors.setdefault(allowed, []).append((oi, oj))
    sector_f32: Dict[Tuple[int, ...], Array] = {}
    for allowed in sectors:
        acc = jnp.zeros(elev.shape, dtype=bool)
        for d_idx in allowed:
            acc = acc | ray_fail[d_idx]
        sector_f32[allowed] = acc.astype(jnp.float32)

    has_cand = jnp.zeros(elev.shape, dtype=bool)
    fail_from_cand = jnp.zeros(elev.shape, dtype=bool)
    for allowed, offs in sectors.items():
        plane = sector_f32[allowed]
        for oi, oj in offs:
            c_elev = _shifted(elev, oi, oj, jnp.nan)
            c_in = _shifted(in_map, oi, oj, False)
            c_step0 = _shifted(step0, oi, oj, False)
            active = c_in & c_step0 & (c_elev > elev + crit)
            has_cand = has_cand | active
            fail_from_cand = fail_from_cand | (
                active & (_shifted(plane, oi, oj, 0.0) > 0.5)
            )

    # self-fallback (no candidate): all directions allowed, relative to self
    fail_self = jnp.zeros(elev.shape, dtype=bool)
    for rf in ray_fail:
        fail_self = fail_self | rf

    # logical ops, not jnp.where: Mosaic cannot lower select on i1 vectors
    fail = step0 & ((has_cand & fail_from_cand) | (~has_cand & fail_self))
    return ~fail


def compute_veto_fields(
    layers: Dict[str, Array], cfg: VetoConfig, in_map: Optional[Array] = None
) -> Dict[str, Array]:
    """All veto fields + the combined traversable mask, densely.

    Input layers: elevation, traversability_slope, traversability_step
    (+ traversability_roughness when cfg.check_roughness).

    Returns boolean planes slope_ok / step_ok / (roughness_ok) /
    traversable_mask, plus float ``*_footprint`` layers with reference parity
    (1.0 pass, 0.0 fail, NaN where the reference would never compute them —
    i.e. where the corresponding layer is nonzero).
    """
    res = cfg.resolution
    slope_ok = _count_veto_ok(
        layers["traversability_slope"], res, cfg.slope_n_critical
    )
    step_ok = step_veto_ok(
        layers["elevation"], layers["traversability_step"], cfg, in_map
    )
    out: Dict[str, Array] = {"slope_ok": slope_ok, "step_ok": step_ok}
    mask = slope_ok & step_ok
    if cfg.check_roughness:
        rough_ok = _count_veto_ok(
            layers["traversability_roughness"], res, cfg.roughness_n_critical
        )
        out["roughness_ok"] = rough_ok
        mask = mask & rough_ok
    out["traversable_mask"] = mask

    nan = jnp.float32(jnp.nan)
    out["slope_footprint"] = jnp.where(
        layers["traversability_slope"] == 0.0,
        slope_ok.astype(jnp.float32),
        nan,
    )
    out["step_footprint"] = jnp.where(
        layers["traversability_step"] == 0.0,
        step_ok.astype(jnp.float32),
        nan,
    )
    if cfg.check_roughness:
        out["roughness_footprint"] = jnp.where(
            layers["traversability_roughness"] == 0.0,
            out["roughness_ok"].astype(jnp.float32),
            nan,
        )
    return out


@partial(jax.jit, static_argnums=(1,))
def compute_veto_fields_jit(layers: Dict[str, Array], cfg: VetoConfig):
    return compute_veto_fields(layers, cfg)
