"""Batched footprint & path traversability evaluation on device.

TPU-first re-expression of the reference's query engine
(/root/reference/traversability_estimation/src/TraversabilityMap.cpp:320-746):
the per-query SpiralIterator walks, LineIterator sampling, and
PolygonIterator rasterization become fixed-shape gathers + masked prefix
reductions, vectorized over thousands of poses/paths at once. The veto
cascade is consumed as the dense ``traversable_mask`` plane from
``ops.veto`` (verdict-equivalent to the reference's lazy memo caches).

Semantics parity:
- circular checks reproduce the exact grid_map spiral visit order (static
  host-precomputed ordering) because the reference's first-failure
  radius-inflation result depends on within-ring order;
- line sampling keeps the reference's stride-4 (nSkip=3) Bresenham walk from
  segment end to start;
- polygonal checks rasterize convex hulls of consecutive transformed
  footprints (device monotone chain), crossing-number inclusion, area-weighted
  path aggregation.

Documented deviations (see also oracle/footprint.py):
- radius-inflation verdict follows the intended semantics (pass with
  mean * factor) rather than the reference's two inconsistent buggy paths;
- no cross-query stale memoization: every query is computed fresh from the
  current map (the reference's ``traversability_footprint`` cache can serve a
  stale value to a query with a different radius);
- path-length weighting uses a correct running length (reference reads an
  uninitialized variable for >= 3 poses).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from traversability_estimation_tpu.grid.geometry import (
    line_cells_batch,
    polygon_area,
    spiral_order,
)
from traversability_estimation_tpu.ops.hull import convex_hull_batch

Array = jnp.ndarray


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QueryState:
    """Compact per-map-update state that footprint queries gather from."""

    traversability: Array  # (H, W) f32, NaN = unknown
    traversable_mask: Array  # (H, W) bool, dense veto verdicts
    position: Array  # (2,) map center in map frame
    resolution: float  # static
    default_traversability: float = 0.5  # static

    def tree_flatten(self):
        return (self.traversability, self.traversable_mask, self.position), (
            self.resolution,
            self.default_traversability,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        t, m, p = children
        return cls(t, m, p, aux[0], aux[1])

    @property
    def shape(self) -> Tuple[int, int]:
        return self.traversability.shape


def _origin_offset(state: QueryState) -> Array:
    rows, cols = state.shape
    half = jnp.asarray([rows, cols], jnp.float32) * state.resolution * 0.5
    return state.position + half  # index i covers x in (P0-(i+1)res, P0-i*res]


def _index_of(state: QueryState, xy: Array) -> Array:
    p0 = _origin_offset(state)
    return jnp.floor((p0 - xy) / state.resolution).astype(jnp.int32)


def _position_of(state: QueryState, idx: Array) -> Array:
    p0 = _origin_offset(state)
    return p0 - (idx.astype(jnp.float32) + 0.5) * state.resolution


def _is_inside(state: QueryState, xy: Array) -> Array:
    rows, cols = state.shape
    p0 = _origin_offset(state)
    t = p0 - xy
    length = jnp.asarray([rows, cols], jnp.float32) * state.resolution
    return jnp.all((t >= 0.0) & (t < length), axis=-1)


def _gather_plane(plane: Array, cells: Array, fill):
    """plane (H,W) at integer cells (..., 2); `fill` outside the map."""
    rows, cols = plane.shape
    ci = cells[..., 0]
    cj = cells[..., 1]
    inmap = (ci >= 0) & (ci < rows) & (cj >= 0) & (cj < cols)
    lin = jnp.clip(ci, 0, rows - 1) * cols + jnp.clip(cj, 0, cols - 1)
    vals = jnp.take(plane.reshape(-1), lin)
    return jnp.where(inmap, vals, fill), inmap


# ---------------------------------------------------------------------------
# Circular footprint checks (spiral-order parity)
# ---------------------------------------------------------------------------


def check_circles(
    state: QueryState,
    centers: Array,
    radius_max: float,
    radius_min: float,
) -> Tuple[Array, Array]:
    """Batched isTraversable(center, radiusMax, ..., radiusMin).

    centers: (..., 2) map-frame positions. radius_max/radius_min static.
    Returns (ok (...,) bool, traversability (...,) f32).
    """
    offs_np, rings_np = spiral_order(radius_max, state.resolution)
    n_rings = int(math.ceil(radius_max / state.resolution - 1e-12))
    offs = jnp.asarray(offs_np)  # (K, 2)
    rings = jnp.asarray(rings_np)  # (K,)
    radii = jnp.asarray(
        np.linalg.norm(offs_np.astype(np.float64), axis=1) * state.resolution,
        dtype=jnp.float32,
    )

    centers_in = jnp.asarray(centers, jnp.float32)
    batch_shape = centers_in.shape[:-1]
    # flatten the batch: high-rank (P, S, ..., K) intermediates get padded
    # tiled layouts on TPU that blow up memory; (B, K) tiles cleanly
    centers = centers_in.reshape(-1, 2)
    idx = _index_of(state, centers)  # (..., 2)
    cells = idx[..., None, :] + offs  # (..., K, 2)

    # one packed plane instead of (traversability, mask): gathers cost per
    # index, so this halves the dominant cost. Encoding: passing cell ->
    # tv in [0, 1]; vetoed cell -> -1 - tv; off-map fill -> +inf sentinel.
    tvf = jnp.where(
        jnp.isfinite(state.traversability),
        state.traversability,
        state.default_traversability,
    )
    packed_plane = jnp.where(state.traversable_mask, tvf, -1.0 - tvf)
    v, inmap = _gather_plane(packed_plane, cells, jnp.inf)
    ok_vals = v >= 0.0
    tv = jnp.where(ok_vals, v, -1.0 - v)

    # outermost two rings: grid_map re-checks true Euclidean distance to the
    # (sub-cell accurate) query center
    cell_pos = _position_of(state, cells)
    d2 = jnp.sum((cell_pos - centers[..., None, :]) ** 2, axis=-1)
    outer = rings >= max(n_rings - 1, 0)
    within = jnp.where(outer, d2 <= radius_max * radius_max, True)

    active = inmap & within  # (..., K)
    fail = active & ~ok_vals
    passing = active & ok_vals
    contrib = jnp.where(passing, tv, 0.0)

    K = offs.shape[0]
    any_fail = jnp.any(fail, axis=-1)
    first_fail = jnp.argmax(fail, axis=-1)  # valid only when any_fail

    # pairwise prefix sums: f32 sequential cumsum over hundreds of cells
    # drifts ~1e-3 vs the reference's double accumulation; the log-depth scan
    # keeps it ~1e-5 (and is also the faster lowering on TPU)
    cum_cnt = jax.lax.associative_scan(jnp.add, passing.astype(jnp.float32), axis=-1)
    cum_sum = jax.lax.associative_scan(jnp.add, contrib, axis=-1)
    total_cnt = cum_cnt[..., -1]
    total_sum = cum_sum[..., -1]

    # counts/sums strictly before the first failing spiral position
    ff = first_fail[..., None]
    before_cnt = jnp.squeeze(
        jnp.take_along_axis(cum_cnt, ff, axis=-1), -1
    ) - jnp.squeeze(
        jnp.take_along_axis(passing.astype(jnp.float32), ff, axis=-1), -1
    )
    before_sum = jnp.squeeze(
        jnp.take_along_axis(cum_sum, ff, axis=-1), -1
    ) - jnp.squeeze(jnp.take_along_axis(contrib, ff, axis=-1), -1)
    r_fail = radii[first_fail]

    default = jnp.float32(state.default_traversability)
    mean_all = total_sum / jnp.maximum(total_cnt, 1.0)

    if radius_min == 0.0:
        ok = ~any_fail
        trav = jnp.where(ok, mean_all, 0.0)
    else:
        hard_fail = any_fail & (r_fail <= radius_min)
        inflate = any_fail & (r_fail > radius_min)
        factor = ((r_fail - radius_min) / (radius_max - radius_min) + 1.0) / 2.0
        mean_before = before_sum / jnp.maximum(before_cnt, 1.0)
        ok = ~hard_fail
        trav = jnp.where(
            inflate,
            mean_before * factor,
            jnp.where(hard_fail, 0.0, mean_all),
        )

    # centers outside the map: default verdict (TraversabilityMap.cpp:662-667)
    inside = _is_inside(state, centers)
    ok = jnp.where(inside, ok, default != 0.0)
    trav = jnp.where(inside, trav, default)
    return ok.reshape(batch_shape), trav.reshape(batch_shape)


def traversability_footprint_circles(
    state: QueryState, radius: float, offset: float
) -> Array:
    """Dense per-cell circular footprint scores: the
    ``traversability_footprint`` service layer (TraversabilityMap.cpp:307-318).
    Returns (H, W) float32: score where traversable, 0.0 where not."""
    ok, trav = dense_circle_field(state, radius + offset, radius)
    return jnp.where(ok, trav, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Dense per-cell circle field (the reference's memo layer, batch-computed)
# ---------------------------------------------------------------------------


_FIELD_BLOCK = 64  # spiral offsets unrolled per scan step in
# dense_circle_field: the six (H, W) carry planes round-trip HBM once per
# STEP, so the block factor divides the dominant traffic term; 64 keeps the
# unrolled body comfortably inside XLA's fusion budget (measured 16x faster
# than one-offset steps at radius 0.45 / res 0.03, ~700 offsets)


def dense_circle_field(
    state: QueryState,
    radius_max: float,
    radius_min: float,
    in_map: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Per-cell circular footprint verdict for a query centered at each CELL
    CENTER — the dense realization of the reference's ``traversability_footprint``
    memo layer (TraversabilityMap.cpp:673-678,734: the cache is per-cell, and
    path queries always probe at cell centers via LineIterator+getPosition).

    Computed with ZERO gathers: a ``lax.scan`` over the static spiral offset
    order, each step reading a shifted plane via dynamic_slice of a padded
    buffer — the whole map's spiral scans advance in lockstep. Offsets are
    processed in UNROLLED blocks of ``_FIELD_BLOCK`` per scan step (order
    inside a block is the same sequential spiral order, so first-fail
    tracking is bit-identical): one scan step per offset measured 3.3 ms at
    radius 0.45/0.03 (the six carry planes round-trip HBM ~700 times — 5%
    of the roofline); blocking amortizes the carry traffic by the block
    factor and lets XLA keep the shifted reads in VMEM tiles.

    `in_map`: optional (H, W) bool — cells flagged False behave exactly like
    cells beyond the map edge (they contribute nothing to any spiral). Used
    by the tiled/sharded path, where a tile's halo may extend past the global
    map or into mesh-divisibility padding.

    Returns (ok (H, W) bool, trav (H, W) f32).
    """
    res = state.resolution
    offs_np, rings_np = spiral_order(radius_max, res)
    n_rings = int(math.ceil(radius_max / res - 1e-12))
    # queries at cell centers: the outer-ring Euclidean re-check is static per
    # offset -> drop excluded offsets from the order entirely
    keep = np.ones(len(offs_np), dtype=bool)
    outer = rings_np >= max(n_rings - 1, 0)
    d2 = np.sum(offs_np.astype(np.float64) ** 2, axis=1) * res * res
    keep[outer] = d2[outer] <= radius_max * radius_max
    offs_np = offs_np[keep]
    radii_np = np.sqrt(np.sum(offs_np.astype(np.float64) ** 2, axis=1)) * res

    H, W = state.shape
    R = int(np.max(np.abs(offs_np))) if len(offs_np) else 0
    fail_plane = ~state.traversable_mask
    tv = jnp.where(
        jnp.isfinite(state.traversability),
        state.traversability,
        state.default_traversability,
    )
    # ONE packed plane instead of three (fail / pass / value): each spiral
    # offset's unaligned shift is a vector relayout and dominates the kernel
    # (docs/DESIGN.md §6), so shifting one plane instead of three cuts the
    # binding cost ~3x. Encoding (same as the grouped polygonal evaluator's
    # query plane): failing cell -> -inf, beyond-map / out-of-global cell ->
    # NaN (contributes nothing to any spiral), else the effective
    # traversability value — decoded per offset with 2 compares + 1 select,
    # value bits preserved exactly (accumulation order unchanged, so results
    # are bit-identical to the 3-plane formulation).
    if in_map is not None:
        fail_plane = fail_plane & in_map
        packed = jnp.where(
            in_map,
            jnp.where(fail_plane, -jnp.inf, tv),
            jnp.nan,
        )
    else:
        packed = jnp.where(fail_plane, -jnp.inf, tv)
    pad_packed = jnp.pad(packed, R, constant_values=jnp.nan)

    n_off = len(offs_np)
    n_blk = max(1, -(-n_off // _FIELD_BLOCK))
    n_pad = n_blk * _FIELD_BLOCK
    offs_pad = np.zeros((n_pad, 2), np.int32)
    offs_pad[:n_off] = offs_np
    radii_pad = np.zeros((n_pad,), np.float32)
    radii_pad[:n_off] = radii_np
    offs = jnp.asarray(offs_pad.reshape(n_blk, _FIELD_BLOCK, 2))
    radii = jnp.asarray(radii_pad.reshape(n_blk, _FIELD_BLOCK))

    def block_step(carry, off_b, r_b, n_active):
        """One block of `n_active` offsets, unrolled in spiral order —
        first-fail tracking identical to the one-offset-per-step scan."""
        found, r_fail, cnt_b, sum_b, cnt, ssum = carry
        for k in range(n_active):
            oi = off_b[k, 0] + R
            oj = off_b[k, 1] + R
            v_k = jax.lax.dynamic_slice(pad_packed, (oi, oj), (H, W))
            fail_k = v_k == -jnp.inf
            is_pass = jnp.isfinite(v_k)  # NaN (out) and -inf (fail) excluded
            pass_k = is_pass.astype(jnp.float32)
            tv_k = jnp.where(is_pass, v_k, 0.0)
            new_fail = fail_k & ~found
            r_fail = jnp.where(new_fail, r_b[k], r_fail)
            cnt_b = jnp.where(new_fail, cnt, cnt_b)
            sum_b = jnp.where(new_fail, ssum, sum_b)
            found = found | fail_k
            cnt = cnt + pass_k
            ssum = ssum + tv_k
        return (found, r_fail, cnt_b, sum_b, cnt, ssum)

    z = jnp.zeros((H, W), jnp.float32)
    carry = (jnp.zeros((H, W), bool), z, z, z, z, z)
    if n_blk > 1:
        carry, _ = jax.lax.scan(
            lambda c, xs: (block_step(c, xs[0], xs[1], _FIELD_BLOCK), None),
            carry,
            (offs[:-1], radii[:-1]),
        )
    # last (possibly partial) block with a static tail length
    tail = n_off - (n_blk - 1) * _FIELD_BLOCK
    carry = block_step(carry, offs[-1], radii[-1], tail)
    found, r_fail, cnt_b, sum_b, cnt, ssum = carry

    mean_all = ssum / jnp.maximum(cnt, 1.0)
    default = jnp.float32(state.default_traversability)
    if radius_min == 0.0:
        ok = ~found
        trav = jnp.where(ok, mean_all, 0.0)
    else:
        hard = found & (r_fail <= radius_min)
        inflate = found & (r_fail > radius_min)
        factor = ((r_fail - radius_min) / (radius_max - radius_min) + 1.0) / 2.0
        mean_b = sum_b / jnp.maximum(cnt_b, 1.0)
        ok = ~hard
        trav = jnp.where(inflate, mean_b * factor, jnp.where(hard, 0.0, mean_all))
    empty = (cnt == 0.0) & ~found
    ok = jnp.where(empty, default != 0.0, ok)
    trav = jnp.where(empty, default, trav)
    return ok, trav.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Circular footprint paths
# ---------------------------------------------------------------------------


def check_circular_paths(
    state: QueryState,
    poses: Array,
    n_poses: Array,
    radius: float,
    offset: float = 0.15,
    max_segment_cells: int = 64,
    field: Optional[Tuple[Array, Array]] = None,
    has_single_pose: bool = True,
) -> Tuple[Array, Array]:
    """Batched checkCircularFootprintPath (TraversabilityMap.cpp:345-462).

    poses: (P, N, 2) map-frame positions, first n_poses[p] valid per path.
    `field`: optional precomputed ``dense_circle_field(state, radius+offset,
    radius)`` — pass it when issuing many batches against one map epoch so the
    field build amortizes (the reference's memo-cache reuse, batched).
    `has_single_pose` (static): pass False when no path in the batch has
    exactly one pose — skips the exact sub-cell spiral evaluation, which is
    the only gather-heavy part left (single-pose queries probe an arbitrary
    position; multi-pose samples are always cell centers served by `field`).
    Returns (is_safe (P,), traversability (P,)).
    """
    poses = jnp.asarray(poses, jnp.float32)
    P, N, _ = poses.shape
    n_poses = jnp.asarray(n_poses, jnp.int32)

    # --- single-pose paths ----------------------------------------------
    if has_single_pose or N == 1:
        ok1, trav1 = check_circles(state, poses[:, 0, :], radius + offset, radius)
    else:
        ok1 = jnp.zeros((P,), bool)
        trav1 = jnp.zeros((P,), jnp.float32)

    if N == 1:
        safe = ok1 & (n_poses >= 1)
        return safe, jnp.where(ok1, trav1, 0.0)

    # --- multi-pose: per segment, stride-4 line sampling ------------------
    # Path samples are always CELL CENTERS (LineIterator + getPosition), so
    # the per-cell dense circle field answers every sample with one lookup —
    # the reference's memo layer philosophy, computed as a gather-free stencil
    # scan once per (map, radius).
    if field is None:
        field = dense_circle_field(state, radius + offset, radius)
    field_ok, field_trav = field

    starts = poses[:, :-1, :]  # (P, N-1, 2)
    ends = poses[:, 1:, :]
    seg_valid = (jnp.arange(1, N)[None, :] < n_poses[:, None])  # (P, N-1)

    start_idx = _index_of(state, starts)
    end_idx = _index_of(state, ends)
    # reference iterates from END to START (TraversabilityMap.cpp:404)
    cells, cell_valid, n_line_cells = line_cells_batch(
        end_idx, start_idx, max_segment_cells
    )
    # stride-4 sampling (nSkip = 3): positions 0, 4, 8, ...
    S = (max_segment_cells + 3) // 4
    sample_ids = jnp.arange(S) * 4
    s_cells = cells[..., sample_ids, :]  # (P, N-1, S, 2)
    s_valid = cell_valid[..., sample_ids]  # (P, N-1, S)

    default = float(state.default_traversability)
    # pack (ok, trav) into ONE plane to halve the gather count (the batch is
    # element-gather bound): trav >= 0, so ok <-> packed >= 0 and the failing
    # branch stores -1 - trav (losslessly decodable)
    packed = jnp.where(field_ok, field_trav, -1.0 - field_trav)
    fill = default if default != 0.0 else -1.0 - default
    p_s, _ = _gather_plane(packed, s_cells, jnp.float32(fill))
    ok_s = p_s >= 0.0
    trav_s = jnp.where(ok_s, p_s, -1.0 - p_s)

    return aggregate_sampled_segments(
        ok_s, trav_s, s_valid, seg_valid, starts, ends, n_poses, ok1, trav1
    )


def aggregate_sampled_segments(
    ok_s: Array,
    trav_s: Array,
    s_valid: Array,
    seg_valid: Array,
    starts: Array,
    ends: Array,
    n_poses: Array,
    ok1: Array,
    trav1: Array,
) -> Tuple[Array, Array]:
    """Segment -> path aggregation shared by the local and tiled circular
    path checkers: per-segment all-samples-ok + sample-mean, then
    length-weighted path mean (TraversabilityMap.cpp:441-456 with the
    uninitialized-lengthPath bug fixed, PARITY.md item 2)."""
    s_active = s_valid & seg_valid[..., None]
    seg_ok = jnp.all(ok_s | ~s_active, axis=-1)  # (P, N-1)
    n_s = jnp.maximum(jnp.sum(s_active, axis=-1), 1)
    seg_trav = jnp.sum(jnp.where(s_active, trav_s, 0.0), axis=-1) / n_s

    seg_len = jnp.linalg.norm(ends - starts, axis=-1)  # (P, N-1)
    w = jnp.where(seg_valid, seg_len, 0.0)
    # degenerate all-zero-length multi-pose path: uniform weights
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(w_sum > 0.0, w, seg_valid.astype(jnp.float32))
    path_trav_multi = jnp.sum(w * seg_trav, axis=-1) / jnp.maximum(
        jnp.sum(w, axis=-1), 1e-30
    )
    multi_ok = jnp.all(seg_ok | ~seg_valid, axis=-1)

    is_single = n_poses == 1
    safe = jnp.where(is_single, ok1, multi_ok) & (n_poses >= 1)
    trav = jnp.where(is_single, trav1, path_trav_multi)
    return safe, jnp.where(safe, trav, jnp.where(is_single, 0.0, 0.0))


def check_inclination_paths(
    state: QueryState,
    robot_slope: Array,
    poses: Array,
    n_poses: Array,
    max_segment_cells: int,
) -> Array:
    """Batched checkInclination (TraversabilityMap.cpp:748-762): a path fails
    if any valid `robot_slope` cell on any segment's full Bresenham line
    (stride 1) is exactly 0. Single-pose paths test the pose's own cell.

    Note: no in-repo filter of the reference produces `robot_slope`; this is
    only active when a configured chain adds that layer (SURVEY.md §2.1).
    Returns ok (P,) bool.
    """
    poses = jnp.asarray(poses, jnp.float32)
    P, N, _ = poses.shape
    fail_plane = robot_slope == 0.0  # NaN -> False (invalid cells skipped)

    idx0 = _index_of(state, poses[:, 0, :])
    f0, _ = _gather_plane(fail_plane, idx0, False)
    if N == 1:
        return ~f0

    starts = poses[:, :-1, :]
    ends = poses[:, 1:, :]
    seg_valid = jnp.arange(1, N)[None, :] < n_poses[:, None]
    cells, cell_valid, _ = line_cells_batch(
        _index_of(state, starts), _index_of(state, ends), max_segment_cells
    )
    f, _ = _gather_plane(fail_plane, cells, False)
    seg_fail = jnp.any(f & cell_valid, axis=-1)
    multi_fail = jnp.any(seg_fail & seg_valid, axis=-1)
    return jnp.where(n_poses == 1, ~f0, ~multi_fail)


# ---------------------------------------------------------------------------
# Polygonal footprints
# ---------------------------------------------------------------------------


def transform_footprint(
    footprint: Array, positions: Array, quaternions: Array
) -> Array:
    """Transform footprint vertices (V, 2) by poses: full 3D rotation of
    (x, y, 0) + translation, then drop z (TraversabilityMap.cpp:484-508).

    positions: (..., 3); quaternions: (..., 4) as (x, y, z, w).
    Returns (..., V, 2).
    """
    fp = jnp.asarray(footprint, jnp.float32)
    V = fp.shape[0]
    x, y, z, w = (quaternions[..., i] for i in range(4))
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0.0, 2.0 / n, 0.0)
    # rotation matrix rows acting on (px, py, 0)
    r00 = 1 - s * (y * y + z * z)
    r01 = s * (x * y - z * w)
    r10 = s * (x * y + z * w)
    r11 = 1 - s * (x * x + z * z)
    px = fp[:, 0]
    py = fp[:, 1]
    # pin the products' rounding: downstream hull construction compares
    # cross products EXACTLY against 0 (collinearity), so vertex values must
    # be bit-identical across jit contexts (FMA contraction varies with the
    # surrounding fusion and was observed to corrupt hulls under shard_map)
    a, b, c, d = jax.lax.optimization_barrier(
        (
            r00[..., None] * px,
            r01[..., None] * py,
            r10[..., None] * px,
            r11[..., None] * py,
        )
    )
    out_x = a + b + positions[..., 0:1]
    out_y = c + d + positions[..., 1:2]
    return jnp.stack([out_x, out_y], axis=-1)


def _crossing_count(vertices: Array, n_vertices: Array, px: Array, py: Array) -> Array:
    """Crossing-number inside test over a separable cell grid.

    Exactly equivalent to ``geometry.polygon_contains`` evaluated at every
    (px[i], py[j]) pair, but factored for the separable structure: the
    x-threshold comparison ``(px - xi) * denom <> rhs`` depends on (b, i, e)
    x (b, e, j) broadcasts only — ~3 ops per cell-edge instead of ~10 (the
    sign of denom is folded in by exact +-1 multiplies, so every comparison
    is bit-identical to polygon_contains').

    vertices: (B, M, 2); n_vertices: (B,); px: (B, wi); py: (B, wj).
    Returns inside (B, wi, wj) bool.
    """
    B, M, _ = vertices.shape
    idx = jnp.arange(M)
    nv = jnp.asarray(n_vertices, jnp.int32)
    jdx = jnp.where(idx[None, :] == 0, nv[:, None] - 1, idx[None, :] - 1)  # (B, M)
    vi = vertices
    vj = jnp.take_along_axis(vertices, jnp.broadcast_to(jdx[..., None], vi.shape), axis=1)
    xi, yi = vi[..., 0], vi[..., 1]  # (B, M)
    xj, yj = vj[..., 0], vj[..., 1]
    denom = yj - yi
    s = jnp.where(denom > 0.0, 1.0, -1.0).astype(jnp.float32)
    valid = idx[None, :] < nv[:, None]

    wi = px.shape[-1]
    wj = py.shape[-1]
    cnt = jnp.zeros((B, wi, wj), jnp.int32)
    for e in range(M):
        cond_e = ((yi[:, e : e + 1] > py) != (yj[:, e : e + 1] > py)) & valid[
            :, e : e + 1
        ]  # (B, wj)
        lhs_e = (px - xi[:, e : e + 1]) * (denom[:, e : e + 1] * s[:, e : e + 1])
        rhs_e = (
            (xj[:, e : e + 1] - xi[:, e : e + 1]) * (py - yi[:, e : e + 1])
        ) * s[:, e : e + 1]
        cross_e = cond_e[:, None, :] & (lhs_e[:, :, None] < rhs_e[:, None, :])
        cnt = cnt + cross_e.astype(jnp.int32)
    return (cnt & 1) == 1


_POLY_CHUNK = 8192  # vmapped dynamic_slice window fetches degrade super-
# linearly past ~10k slices on TPU (measured 0.25 ms @ 8k vs 115 ms @ 50k);
# larger batches stream through lax.map over chunks of this size


def _eval_polygon_windows(
    state: QueryState, vertices: Array, n_vertices: Array, anchor_idx: Array, window
) -> Tuple[Array, Array, Array]:
    """Core masked-window reduction shared by all polygon checks.

    One packed plane (off-map -> +inf, vetoed -> -inf, else traversability
    with NaN->default) is window-fetched per polygon with a vmapped
    dynamic_slice (block fetches; element gathers measure ~10x slower), the
    crossing-number inside mask is computed from separable cell positions,
    and the fail/count/sum reductions fuse into the fetch.
    Returns (fail (B,), n_cells (B,), tv_sum (B,)).
    """
    H, W = state.shape
    wi, wj = (window, window) if isinstance(window, int) else window
    half_i, half_j = wi // 2, wj // 2
    pad = max(wi, wj)
    tv_eff = jnp.where(
        jnp.isfinite(state.traversability),
        state.traversability,
        state.default_traversability,
    )
    packed = jnp.where(state.traversable_mask, tv_eff, -jnp.inf)
    packed = jnp.pad(packed, pad, constant_values=jnp.inf)

    p0 = _origin_offset(state)
    res = state.resolution

    def eval_chunk(vertices, n_vertices, anchor_idx):
        # clipped start: a fully off-map anchor lands the window entirely in
        # the +inf padding ring (pad >= wi, wj), so verdicts are unchanged
        start_i = jnp.clip(anchor_idx[:, 0] - half_i + pad, 0, H + 2 * pad - wi)
        start_j = jnp.clip(anchor_idx[:, 1] - half_j + pad, 0, W + 2 * pad - wj)

        win = jax.vmap(
            lambda si, sj: jax.lax.dynamic_slice(packed, (si, sj), (wi, wj))
        )(start_i, start_j)  # (B, wi, wj)

        gi = (start_i[:, None] - pad) + jnp.arange(wi, dtype=jnp.int32)
        gj = (start_j[:, None] - pad) + jnp.arange(wj, dtype=jnp.int32)
        px = p0[0] - (gi.astype(jnp.float32) + 0.5) * res  # (B, wi)
        py = p0[1] - (gj.astype(jnp.float32) + 0.5) * res  # (B, wj)
        inside = _crossing_count(vertices, n_vertices, px, py)

        fail = jnp.any(inside & (win == -jnp.inf), axis=(1, 2))
        passing = inside & jnp.isfinite(win)
        n_cells = jnp.sum(passing, axis=(1, 2))
        tv_sum = jnp.sum(jnp.where(passing, win, 0.0), axis=(1, 2))
        return fail, n_cells, tv_sum

    B = vertices.shape[0]
    if B <= _POLY_CHUNK:
        return eval_chunk(vertices, n_vertices, anchor_idx)
    nb = -(-B // _POLY_CHUNK)
    Bp = nb * _POLY_CHUNK

    def pad_to(a):
        reps = jnp.broadcast_to(a[:1], (Bp - B,) + a.shape[1:])
        return jnp.concatenate([a, reps], axis=0)

    vs = pad_to(vertices).reshape(nb, _POLY_CHUNK, *vertices.shape[1:])
    ns = pad_to(jnp.asarray(n_vertices, jnp.int32).reshape(B)).reshape(
        nb, _POLY_CHUNK
    )
    an = pad_to(anchor_idx).reshape(nb, _POLY_CHUNK, 2)
    fail, n_cells, tv_sum = jax.lax.map(lambda xs: eval_chunk(*xs), (vs, ns, an))
    return (
        fail.reshape(Bp)[:B],
        n_cells.reshape(Bp)[:B],
        tv_sum.reshape(Bp)[:B],
    )


def check_polygons(
    state: QueryState,
    vertices: Array,
    n_vertices: Array,
    anchors: Array,
    window,
) -> Tuple[Array, Array, Array]:
    """Batched isTraversable(polygon) (TraversabilityMap.cpp:586-645) for
    arbitrary (convex or not) polygons: crossing-number rasterization
    (grid_map PolygonIterator parity) over packed block-fetched windows."""
    anchor_idx = _index_of(state, anchors)  # (B, 2)
    fail, n_cells, tv_sum = _eval_polygon_windows(
        state, vertices, n_vertices, anchor_idx, window
    )
    mean = tv_sum / jnp.maximum(n_cells, 1)
    default = jnp.float32(state.default_traversability)
    empty = (n_cells == 0) & ~fail
    ok = ~fail & jnp.where(empty, default != 0.0, True)
    trav = jnp.where(fail, 0.0, jnp.where(empty, default, mean))
    return ok, trav, n_cells


def polygon_prefix_planes(state: QueryState) -> Tuple[Array, Array]:
    """Per-row prefix sums consumed by ``check_convex_polygons``: computed once per
    traced query (XLA CSEs across the batch), they turn every hull-row
    reduction into two lookups.

    Returns (counts (H, W+1) int32 with per-cell value fail*65536 + pass,
    tv (H, W+1) f32 prefix of passing-cell traversability with NaN->default).
    """
    ok = state.traversable_mask
    tv = jnp.where(
        jnp.isfinite(state.traversability),
        state.traversability,
        state.default_traversability,
    )
    fail_i = (~ok).astype(jnp.int32)
    pass_i = ok.astype(jnp.int32)
    # packed row prefix stays exact in int32 for maps up to ~32k columns
    # (W * 65537 < 2^31)
    counts_cell = fail_i * 65536 + pass_i
    tv_cell = jnp.where(ok, tv, 0.0)
    zeros_i = jnp.zeros((ok.shape[0], 1), jnp.int32)
    zeros_f = jnp.zeros((ok.shape[0], 1), jnp.float32)
    counts = jnp.concatenate([zeros_i, jnp.cumsum(counts_cell, axis=1)], axis=1)
    tv_pre = jnp.concatenate([zeros_f, jnp.cumsum(tv_cell, axis=1)], axis=1)
    return counts, tv_pre


# The round-1 convex specialization (analytic row spans + prefix-sum lookups)
# is superseded locally by the packed-window formulation above (the span
# prefix gathers were 50% of the polygonal batch time; block window fetches
# + fused reduce measure ~4x faster end to end). The span formulation lives
# on in parallel/sharding.check_polygonal_paths_tiled, where spans are what
# lets each device intersect the query with its own tile.
check_convex_polygons = check_polygons


def swept_hull_translates(
    poly1: Array, poly2: Array, footprint: Array, d: Array
) -> Tuple[Array, Array]:
    """Convex hull of two TRANSLATED copies of one convex polygon, O(V).

    For identity-orientation paths, consecutive footprints are translates of
    the same convex polygon: hull(P u P+d) = P (+) segment[0, d] (Minkowski),
    whose boundary is P's edges with the two bridge edges (+-d) inserted at
    the two extreme vertices. Emitted branchlessly as a fixed 2V-vertex ring:
    vertex k contributes its poly1 copy where the adjacent edge's outward
    normal opposes d, its poly2 copy where it aligns, and BOTH at the two
    straddle vertices. Duplicate vertices (the common case) are harmless for
    crossing tests and shoelace area (zero-length edges contribute nothing).

    Replaces the O(V^3) edge-matrix hull (ops/hull.py) on this path — same
    cell sets and areas, bit-identical vertex VALUES (pure selects between
    poly1/poly2, no arithmetic), ~30% of the polygonal batch time removed.
    Matches grid_map Polygon::convexHull as used at TraversabilityMap.cpp:546.

    poly1, poly2: (..., V, 2) translated copies; footprint: (V, 2) base
    polygon (CONVEX in stored order — caller's responsibility, see
    ``is_convex_polygon``); d: (..., 2) translation poly1 -> poly2.
    Returns (hull (..., 2V, 2), n_hull (...,) = 2V).
    """
    fp = jnp.asarray(footprint, jnp.float32)
    V = fp.shape[0]
    e = jnp.roll(fp, -1, axis=0) - fp  # edge k: v_k -> v_{k+1}, (V, 2)
    # orientation: shoelace sign (+1 CCW, -1 CW), computed on device so the
    # footprint stays a traced value
    orient = jnp.sign(
        jnp.sum(fp[:, 0] * jnp.roll(fp, -1, axis=0)[:, 1] - jnp.roll(fp, -1, axis=0)[:, 0] * fp[:, 1])
    )
    orient = jnp.where(orient == 0.0, 1.0, orient)
    # outward normal of edge k opposes d  <=>  orient * cross(e_k, d) >= 0
    cross = e[:, 0] * d[..., None, 1] - e[:, 1] * d[..., None, 0]  # (..., V)
    g = (cross * orient) < 0.0  # True -> poly2 copy past edge k
    g_prev = jnp.roll(g, 1, axis=-1)  # flag of edge k-1 (entering vertex k)

    sel_in = jnp.where(g_prev[..., None], poly2, poly1)  # (..., V, 2)
    sel_out = jnp.where(g[..., None], poly2, poly1)
    hull = jnp.stack([sel_in, sel_out], axis=-2)  # (..., V, 2, 2)
    hull = hull.reshape(*poly1.shape[:-2], 2 * V, 2)
    n_hull = jnp.full(poly1.shape[:-2], 2 * V, jnp.int32)
    return hull, n_hull


def is_convex_polygon(footprint: np.ndarray) -> bool:
    """Host-side: is the polygon convex in its stored vertex order
    (collinear vertices allowed)? Gates the swept-hull translate fast path."""
    fp = np.asarray(footprint, np.float64)
    if len(fp) < 3:
        return False
    e = np.roll(fp, -1, axis=0) - fp
    cross = e[:, 0] * np.roll(e, -1, axis=0)[:, 1] - e[:, 1] * np.roll(e, -1, axis=0)[:, 0]
    return bool(np.all(cross >= 0.0) or np.all(cross <= 0.0))


def check_polygonal_paths(
    state: QueryState,
    positions: Array,
    quaternions: Array,
    n_poses: Array,
    footprint: Array,
    window: int,
    conservative: bool = False,
    translate_only: bool = False,
) -> Tuple[Array, Array, Array]:
    """Batched checkPolygonalFootprintPath (TraversabilityMap.cpp:464-584).

    positions: (P, N, 3); quaternions: (P, N, 4) xyzw; footprint: (V, 2) in
    the base frame; `window` must cover hulls of consecutive footprints.
    `translate_only` (static): pass True only when every quaternion is
    identity AND the footprint is convex in stored order (host-checked via
    ``is_convex_polygon``) — consecutive-footprint hulls then skip the
    O(V^3) device hull for the O(V) swept-hull emission.
    Returns (is_safe (P,), traversability (P,), area (P,)).
    """
    positions = jnp.asarray(positions, jnp.float32)
    quaternions = jnp.asarray(quaternions, jnp.float32)
    P, N, _ = positions.shape
    V = footprint.shape[0]
    n_poses = jnp.asarray(n_poses, jnp.int32)

    polys = transform_footprint(footprint, positions, quaternions)  # (P, N, V, 2)

    # --- single-pose: raw user footprint, possibly non-convex ---------------
    ok1, trav1, _ = check_polygons(
        state,
        polys[:, 0, :, :],
        jnp.full((P,), V, jnp.int32),
        positions[:, 0, :2],
        window,
    )
    area1 = jax.vmap(polygon_area, in_axes=(0, None))(polys[:, 0], V)

    if N == 1:
        safe = ok1 & (n_poses >= 1)
        return safe, jnp.where(ok1, trav1, 0.0), jnp.where(ok1, area1, 0.0)

    # --- consecutive-pose hulls --------------------------------------------
    prev = polys[:, :-1, :, :]  # (P, N-1, V, 2)
    cur = polys[:, 1:, :, :]
    if conservative:
        d = (positions[:, 1:, :2] - positions[:, :-1, :2])[:, :, None, :]
        poly1 = jnp.concatenate([prev, cur - d], axis=2)  # (P, N-1, 2V, 2)
        poly2 = jnp.concatenate([cur, prev + d], axis=2)
    else:
        poly1 = prev
        poly2 = cur
    Mv = poly1.shape[2]

    if translate_only and not conservative:
        d2 = positions[:, 1:, :2] - positions[:, :-1, :2]  # (P, N-1, 2)
        hulls, n_hull = swept_hull_translates(prev, cur, footprint, d2)
        hulls = hulls.reshape(P * (N - 1), 2 * V, 2)
        n_hull = n_hull.reshape(P * (N - 1))
    else:
        points = jnp.concatenate([poly1, poly2], axis=2)  # (P, N-1, 2Mv, 2)
        flat_pts = points.reshape(P * (N - 1), 2 * Mv, 2)
        n_valid = jnp.full((P * (N - 1),), 2 * Mv, jnp.int32)
        hulls, n_hull = convex_hull_batch(flat_pts, n_valid)
    Mh = hulls.shape[1]

    mids = 0.5 * (positions[:, 1:, :2] + positions[:, :-1, :2]).reshape(
        P * (N - 1), 2
    )
    seg_ok, seg_trav, _ = check_convex_polygons(state, hulls, n_hull, mids, window)
    seg_ok = seg_ok.reshape(P, N - 1)
    seg_trav = seg_trav.reshape(P, N - 1)

    hull_area = jax.vmap(polygon_area)(hulls, n_hull).reshape(P, N - 1)
    # grid_map getArea over polygon1's stored vertex order
    poly1_flat = poly1.reshape(P * (N - 1), Mv, 2)
    poly1_area = jax.vmap(polygon_area, in_axes=(0, None))(poly1_flat, Mv).reshape(
        P, N - 1
    )

    seg_valid = jnp.arange(1, N)[None, :] < n_poses[:, None]  # (P, N-1)
    multi_ok = jnp.all(seg_ok | ~seg_valid, axis=-1)

    # area-weighted running aggregation (TraversabilityMap.cpp:569-578):
    # i == 1: area = hullArea; trav = segTrav
    # i  > 1: areaNew = hullArea_i - poly1Area_i; area += areaNew;
    #         trav = (areaNew * segTrav_i + areaPrev * trav) / area
    first_w = hull_area[:, 0]
    later_w = hull_area[:, 1:] - poly1_area[:, 1:]
    weights = jnp.concatenate([first_w[:, None], later_w], axis=1)
    weights = jnp.where(seg_valid, weights, 0.0)
    total_area = jnp.sum(weights, axis=-1)
    trav_multi = jnp.sum(weights * seg_trav, axis=-1) / jnp.where(
        total_area != 0.0, total_area, 1.0
    )

    is_single = n_poses == 1
    safe = jnp.where(is_single, ok1, multi_ok) & (n_poses >= 1)
    trav = jnp.where(is_single, jnp.where(ok1, trav1, 0.0), trav_multi)
    area = jnp.where(is_single, jnp.where(ok1, area1, 0.0), total_area)
    trav = jnp.where(safe, trav, 0.0)
    area = jnp.where(safe | is_single, area, 0.0)
    return safe, trav, area


_SEG_BLOCK = 8  # segments evaluated per scan step in the grouped evaluator:
# amortizes both the scan-step overhead (~80 us/step measured) and the
# window re-read across 8 hulls

# How check_polygonal_paths_grouped materializes its (wi, wj, P) per-path
# windows (PROF_GROUPED row F: this fetch was 1.39 ms of the 3.94 ms rotated
# batch at 0.248 ns/elem — the single biggest line, VERDICT r4 weak #2):
#   "fused"     vmapped dynamic_slice with out_axes=2 — XLA fuses the gather
#               with the batch-minor transpose (round-4 production)
#   "transpose" layout-preserving per-path slices (P, wi, wj) followed by
#               ONE explicit transpose — lets XLA use its tiled-transpose
#               path instead of a scatter-shaped fused gather
#   "rowgather" contiguous-row gather (P*wi, W') at stream bandwidth, then
#               per-path lane slices + one explicit transpose
# All three are value-identical (tests/test_footprint.py); the default is
# the chip A/B winner (scripts/profile_grouped.py rows F/F2/F3).
_WINDOW_FETCH_MODE = "fused"


def path_group_window(
    footprint: np.ndarray,
    pose_extents: np.ndarray,
    resolution: float,
    identity_orientation: bool = False,
) -> Tuple[int, int]:
    """Static PER-PATH raster window for ``check_polygonal_paths_grouped``:
    covers every consecutive-footprint hull of every path in the batch
    (pose-bbox half extent + footprint reach), bucketed to multiples of 4.

    The conservative sweep needs no extra margin: its extra vertices are the
    footprint placed at the neighboring pose (TraversabilityMap.cpp:510-520),
    which the pose bbox already covers.

    pose_extents: (P, 2) per-path (max - min) over the path's VALID poses.
    """
    fp = np.asarray(footprint, np.float64)
    ext = np.asarray(pose_extents, np.float64).reshape(-1, 2)
    ex = float(ext[:, 0].max()) / 2 if ext.size else 0.0
    ey = float(ext[:, 1].max()) / 2 if ext.size else 0.0

    def cells(reach):
        c = 2 * int(math.ceil(reach / resolution)) + 3
        return ((c + 3) // 4) * 4

    if identity_orientation:
        return (
            cells(ex + float(np.abs(fp[:, 0]).max())),
            cells(ey + float(np.abs(fp[:, 1]).max())),
        )
    r = float(np.max(np.linalg.norm(fp, axis=1)))
    return (cells(ex + r), cells(ey + r))


def per_path_window_cells(
    footprint: np.ndarray,
    positions: np.ndarray,
    quaternions: np.ndarray,
    resolution: float,
) -> np.ndarray:
    """Per-PATH raster-window requirement (P, 2) int cells — the exact
    bbox math of :func:`path_group_window_exact` before its max over the
    batch. Basis for window bucketing (check_polygonal_paths_bucketed)."""
    fp = np.asarray(footprint, np.float64)
    pos = np.asarray(positions, np.float64)[..., :2]
    q = np.asarray(quaternions, np.float64)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = np.where(n > 0.0, 2.0 / np.where(n > 0.0, n, 1.0), 0.0)
    r00 = 1 - s * (y * y + z * z)
    r01 = s * (x * y - z * w)
    r10 = s * (x * y + z * w)
    r11 = 1 - s * (x * x + z * z)
    vx = r00[..., None] * fp[:, 0] + r01[..., None] * fp[:, 1]
    vy = r10[..., None] * fp[:, 0] + r11[..., None] * fp[:, 1]
    lo_x, hi_x = vx.min(axis=-1), vx.max(axis=-1)
    lo_y, hi_y = vy.min(axis=-1), vy.max(axis=-1)

    def adj(a, red):
        out = a.copy()
        out[:, :-1] = red(out[:, :-1], a[:, 1:])
        out[:, 1:] = red(out[:, 1:], a[:, :-1])
        return out

    hi_x, hi_y = adj(hi_x, np.maximum), adj(hi_y, np.maximum)
    lo_x, lo_y = adj(lo_x, np.minimum), adj(lo_y, np.minimum)
    vert_hi_x = (pos[..., 0] + hi_x).max(axis=1)
    vert_lo_x = (pos[..., 0] + lo_x).min(axis=1)
    vert_hi_y = (pos[..., 1] + hi_y).max(axis=1)
    vert_lo_y = (pos[..., 1] + lo_y).min(axis=1)
    anchor = 0.5 * (pos.max(axis=1) + pos.min(axis=1))
    reach_x = np.maximum(vert_hi_x - anchor[:, 0], anchor[:, 0] - vert_lo_x)
    reach_y = np.maximum(vert_hi_y - anchor[:, 1], anchor[:, 1] - vert_lo_y)

    def cells(reach):
        c = 2 * np.ceil(reach / resolution).astype(np.int64) + 3
        return ((c + 3) // 4) * 4

    return np.stack([cells(reach_x), cells(reach_y)], axis=-1)


def plan_window_buckets(
    footprint: np.ndarray,
    positions: np.ndarray,
    quaternions: np.ndarray,
    resolution: float,
    n_buckets: int = 2,
):
    """Host-side WINDOW-BUCKETING plan for a polygonal batch: partition
    paths by their own raster-window requirement (per_path_window_cells)
    into `n_buckets` area-sorted groups, each with the smallest static
    window covering its members.

    Why: the span evaluator's work AND the per-path window fetch both
    scale with window area, but a single static window prices every path
    at the batch WORST case — in a planner batch the per-path extents are
    a random-walk distribution whose tail sets the max, so most paths pay
    for ~2x the area they need. Two buckets split at the area median
    recover most of that.

    Returns (idx_groups, windows, inverse): static index arrays, the
    per-group (wi, wj), and the permutation restoring original order for
    jnp.concatenate over group results. Feed to
    check_polygonal_paths_bucketed — fully traceable, both groups inside
    one compiled program."""
    pos_np = np.asarray(positions, np.float32)
    quat_np = np.asarray(quaternions, np.float32)
    P = pos_np.shape[0]
    win_pp = per_path_window_cells(footprint, pos_np, quat_np, resolution)
    areas = win_pp[:, 0] * win_pp[:, 1]
    order = np.argsort(areas, kind="stable")
    idx_groups, windows = [], []
    lo = 0
    for b in range(n_buckets):
        hi = (P * (b + 1)) // n_buckets
        idx = order[lo:hi]
        lo = hi
        if idx.size == 0:
            continue
        idx_groups.append(idx)
        windows.append(
            (int(win_pp[idx, 0].max()), int(win_pp[idx, 1].max()))
        )
    inverse = np.argsort(np.concatenate(idx_groups), kind="stable")
    return tuple(map(tuple, (g.tolist() for g in idx_groups))), tuple(
        windows
    ), tuple(inverse.tolist())


def check_polygonal_paths_bucketed(
    state: QueryState,
    positions: Array,
    quaternions: Array,
    n_poses: Array,
    footprint: Array,
    plan,
    conservative: bool = False,
    translate_only: bool = False,
) -> Tuple[Array, Array, Array]:
    """Grouped polygonal evaluation under a plan_window_buckets plan: one
    grouped sub-evaluation per bucket with that bucket's static window,
    all inside a single traced program (static gather/scatter indices).

    Per-path results are independent, so bucketing is semantics-free:
    verdicts/areas identical to the single-window call; traversability
    sums accumulate over a different window shape (last-ulp — the same
    tolerance as the exact-window tests)."""
    idx_groups, windows, inverse = plan
    outs = []
    for idx, gw in zip(idx_groups, windows):
        ii = jnp.asarray(np.asarray(idx, np.int32))
        outs.append(
            check_polygonal_paths_grouped(
                state,
                positions[ii],
                quaternions[ii],
                n_poses[ii],
                footprint,
                gw,
                conservative,
                translate_only,
            )
        )
    inv = jnp.asarray(np.asarray(inverse, np.int32))
    safe = jnp.concatenate([o[0] for o in outs])[inv]
    trav = jnp.concatenate([o[1] for o in outs])[inv]
    area = jnp.concatenate([o[2] for o in outs])[inv]
    return safe, trav, area


def path_group_window_exact(
    footprint: np.ndarray,
    positions: np.ndarray,
    quaternions: np.ndarray,
    resolution: float,
) -> Tuple[int, int]:
    """Static PER-PATH raster window from the ACTUAL transformed footprint
    vertices (quaternions are host data at dispatch time), for the rotated
    (non-identity) grouped evaluator.

    ``path_group_window`` prices every rotated batch at pose-extent +
    max-over-ALL-rotations circumradius, composed as a sum of maxima over
    DIFFERENT paths. This computes, per path, the exact bbox of every
    vertex its swept hulls can touch — {pos_k + R_m fp_v, |k-m| <= 1}
    (adjacency covers the conservative sweep's prev+d / cur-d vertices,
    TraversabilityMap.cpp:510-520) — measured around the same pose-bbox
    anchor the evaluator uses, then maxes over the batch. Strictly <= the
    old bound; same +3-cell slack and 4-bucket as path_group_window.

    positions: (P, N, >=2); quaternions: (P, N, 4) xyzw. Padded poses must
    repeat the last valid pose (they only duplicate vertices).
    """
    fp = np.asarray(footprint, np.float64)
    pos = np.asarray(positions, np.float64)[..., :2]
    q = np.asarray(quaternions, np.float64)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = np.where(n > 0.0, 2.0 / np.where(n > 0.0, n, 1.0), 0.0)
    # same planar rows as transform_footprint
    r00 = 1 - s * (y * y + z * z)
    r01 = s * (x * y - z * w)
    r10 = s * (x * y + z * w)
    r11 = 1 - s * (x * x + z * z)
    vx = r00[..., None] * fp[:, 0] + r01[..., None] * fp[:, 1]  # (P, N, V)
    vy = r10[..., None] * fp[:, 0] + r11[..., None] * fp[:, 1]
    lo_x, hi_x = vx.min(axis=-1), vx.max(axis=-1)  # (P, N)
    lo_y, hi_y = vy.min(axis=-1), vy.max(axis=-1)

    def adj(a, red):
        out = a.copy()
        out[:, :-1] = red(out[:, :-1], a[:, 1:])
        out[:, 1:] = red(out[:, 1:], a[:, :-1])
        return out

    hi_x, hi_y = adj(hi_x, np.maximum), adj(hi_y, np.maximum)
    lo_x, lo_y = adj(lo_x, np.minimum), adj(lo_y, np.minimum)
    vert_hi_x = (pos[..., 0] + hi_x).max(axis=1)  # (P,)
    vert_lo_x = (pos[..., 0] + lo_x).min(axis=1)
    vert_hi_y = (pos[..., 1] + hi_y).max(axis=1)
    vert_lo_y = (pos[..., 1] + lo_y).min(axis=1)
    anchor = 0.5 * (pos.max(axis=1) + pos.min(axis=1))  # (P, 2)
    reach_x = float(
        np.maximum(vert_hi_x - anchor[:, 0], anchor[:, 0] - vert_lo_x).max()
    )
    reach_y = float(
        np.maximum(vert_hi_y - anchor[:, 1], anchor[:, 1] - vert_lo_y).max()
    )

    def cells(reach):
        c = 2 * int(math.ceil(reach / resolution)) + 3
        return ((c + 3) // 4) * 4

    return (cells(reach_x), cells(reach_y))


def path_block_window(
    footprint: np.ndarray,
    positions: np.ndarray,
    resolution: float,
    identity_orientation: bool = False,
    seg_block: int = _SEG_BLOCK,
) -> Tuple[int, int]:
    """Static PER-SEGMENT-BLOCK raster window for the grouped evaluator's
    block-window mode: covers every consecutive-footprint hull of any
    ``seg_block`` consecutive segments (block pose-bbox half extent +
    footprint reach), bucketed to multiples of 4.

    A block of 8 segments spans ~8 pose steps instead of the whole path, so
    its window is much smaller than ``path_group_window``'s — the span
    evaluator's work scales with window area, which is what makes the
    rotated (general) case fast. Conservative sweeps need no extra margin
    (same argument as path_group_window).

    positions: (P, N, >=2) the actual pose batch (padded poses must repeat
    the last valid pose — they only shrink the bbox).
    """
    fp = np.asarray(footprint, np.float64)
    pos = np.asarray(positions, np.float64)[..., :2]
    P, N = pos.shape[:2]
    S = max(N - 1, 1)
    ex = ey = 0.0
    for b0 in range(0, S, seg_block):
        # block b covers segments [b0, b0+SB) -> poses [b0, b0+SB]
        sl = pos[:, b0 : min(b0 + seg_block, S) + 1]
        e = sl.max(axis=1) - sl.min(axis=1)  # (P, 2)
        ex = max(ex, float(e[:, 0].max()) / 2)
        ey = max(ey, float(e[:, 1].max()) / 2)

    def cells(reach):
        c = 2 * int(math.ceil(reach / resolution)) + 3
        return ((c + 3) // 4) * 4

    if identity_orientation:
        return (
            cells(ex + float(np.abs(fp[:, 0]).max())),
            cells(ey + float(np.abs(fp[:, 1]).max())),
        )
    r = float(np.max(np.linalg.norm(fp, axis=1)))
    return (cells(ex + r), cells(ey + r))


def check_polygonal_paths_grouped(
    state: QueryState,
    positions: Array,
    quaternions: Array,
    n_poses: Array,
    footprint: Array,
    window: Tuple[int, int],
    conservative: bool = False,
    translate_only: bool = False,
    block_window: Optional[Tuple[int, int]] = None,
) -> Tuple[Array, Array, Array]:
    """checkPolygonalFootprintPath (TraversabilityMap.cpp:464-584), grouped
    per PATH — the fast formulation for planner batches with short segments.

    The per-segment evaluator fetches one raster window per segment; since a
    path's consecutive hulls overlap almost entirely, this evaluator fetches
    ONE window per path (pose bbox + footprint reach — 30-40x less gather
    volume on typical planner batches, and gathers are the measured
    bottleneck: ~2.9 ns per gathered element on v5e regardless of width) and
    streams segments through it in blocks of 8:

    - per (edge, window column): binary-search the exact row where the
      crossing-number comparison flips (px is affine in the row index, so
      every probe recomputes the exact grid coordinate — every comparison is
      bit-identical to ``geometry.polygon_contains``'s);
    - convex hulls straddle each horizontal line with exactly 0 or 2 edges,
      so the inside run per column is [min, max) of the flip rows — 2 integer
      compares per cell instead of an 8-edge crossing test;
    - fail/count/sum reduce against the path window in the same fused pass.

    Verified bit-identical verdicts + cell counts vs ``check_polygons`` on
    50k-segment batches (tests/test_footprint.py::TestGroupedPaths).

    REQUIREMENTS (caller-checked, see models/estimator.py):
    - footprint CONVEX in stored order (``is_convex_polygon``) — the span
      rule and the single-pose branch assume convex rings;
    - `window` from ``path_group_window`` (covers every path's pose bbox);
    - padded poses beyond n_poses[p] repeat the last valid pose.

    Returns (is_safe (P,), traversability (P,), area (P,)).
    """
    positions = jnp.asarray(positions, jnp.float32)
    quaternions = jnp.asarray(quaternions, jnp.float32)
    footprint = jnp.asarray(footprint, jnp.float32)
    P, N, _ = positions.shape
    V = footprint.shape[0]
    n_poses = jnp.asarray(n_poses, jnp.int32)
    H, W = state.shape
    res = state.resolution
    use_blocks = block_window is not None
    wi, wj = block_window if use_blocks else window
    half_i, half_j = wi // 2, wj // 2
    gpad = max(wi, wj)
    n_bits = max(1, math.ceil(math.log2(wi + 1)))
    default = jnp.float32(state.default_traversability)

    polys = transform_footprint(footprint, positions, quaternions)  # (P,N,V,2)

    # --- packed query plane + window machinery --------------------------
    tv_eff = jnp.where(
        jnp.isfinite(state.traversability),
        state.traversability,
        state.default_traversability,
    )
    gpacked = jnp.pad(
        jnp.where(state.traversable_mask, tv_eff, -jnp.inf),
        gpad,
        constant_values=jnp.inf,
    )
    p0 = _origin_offset(state)
    irow = jnp.arange(wi, dtype=jnp.int32)[:, None, None, None]

    def fetch_window(anchors):
        """(P, 2) anchors -> ((wi, wj, P) window, (P,) gi0, (wj, P) pyT).

        Batch-minor output for full-lane downstream layouts; the
        materialization strategy is _WINDOW_FETCH_MODE (see its comment)."""
        aidx = _index_of(state, anchors)
        start_i = jnp.clip(aidx[:, 0] - half_i + gpad, 0, H + 2 * gpad - wi)
        start_j = jnp.clip(aidx[:, 1] - half_j + gpad, 0, W + 2 * gpad - wj)
        mode = _WINDOW_FETCH_MODE
        if mode == "transpose":
            winp = jax.vmap(
                lambda si, sj: jax.lax.dynamic_slice(
                    gpacked, (si, sj), (wi, wj)
                )
            )(start_i, start_j)  # (P, wi, wj), layout-preserving
            win = jnp.transpose(winp, (1, 2, 0))
        elif mode == "rowgather":
            W2 = gpacked.shape[1]
            row_ids = (
                start_i[:, None] + jnp.arange(wi, dtype=jnp.int32)[None, :]
            ).reshape(-1)
            rows = jnp.take(gpacked, row_ids, axis=0).reshape(-1, wi, W2)
            winp = jax.vmap(
                lambda r, sj: jax.lax.dynamic_slice(r, (0, sj), (wi, wj))
            )(rows, start_j)  # (P, wi, wj)
            win = jnp.transpose(winp, (1, 2, 0))
        else:  # "fused"
            win = jax.vmap(
                lambda si, sj: jax.lax.dynamic_slice(
                    gpacked, (si, sj), (wi, wj)
                ),
                out_axes=2,
            )(start_i, start_j)
        gi0 = (start_i - gpad).astype(jnp.float32)
        gjT = (start_j[None, :] - gpad) + jnp.arange(wj, dtype=jnp.int32)[:, None]
        pyT = p0[1] - (gjT.astype(jnp.float32) + 0.5) * res  # (wj, P)
        return win, gi0, pyT

    def planes_of(win):
        neg = win == -jnp.inf
        fin = jnp.isfinite(win)
        winz = jnp.where(fin, win, 0.0)
        return neg, fin, winz

    def seg_block(h_blk, planes, gi0, pyT):
        """(fail, n, sum) for a block of convex rings per path.

        h_blk: (P, SB, Mb, 2) — vertex rings closed by wrap at Mb; padding
        must duplicate real vertices (zero-length edges never straddle a
        horizontal line, so they contribute nothing).
        planes/gi0/pyT: the (wi, wj, P) window context the block reduces
        against (per path, or per (path, block) in block-window mode).
        Returns three (SB, P) arrays.
        """
        neg, fin, winz = planes

        def px_at(i_f32):  # float row index (within window) -> exact grid px
            return p0[0] - ((gi0 + i_f32).astype(jnp.float32) + 0.5) * res

        SB, Mb = h_blk.shape[1], h_blk.shape[2]
        E = SB * Mb
        hb = h_blk.reshape(P, E, 2)
        base = (jnp.arange(E) // Mb) * Mb
        off = jnp.arange(E) % Mb
        jdx_full = base + jnp.where(off == 0, Mb - 1, off - 1)
        vi = hb
        vj = hb[:, jdx_full, :]
        xiT, yiT = vi[..., 0].T, vi[..., 1].T  # (E, P)
        xjT, yjT = vj[..., 0].T, vj[..., 1].T
        denom = yjT - yiT
        s = jnp.where(denom > 0.0, 1.0, -1.0)
        d_abs = denom * s
        cond = (yiT[:, None, :] > pyT[None, :, :]) != (
            yjT[:, None, :] > pyT[None, :, :]
        )  # (E, wj, P)
        rhs = ((xjT - xiT)[:, None, :] * (pyT[None, :, :] - yiT[:, None, :])) * s[
            :, None, :
        ]
        lo = jnp.zeros((E, wj, P), jnp.int32)
        hi = jnp.full((E, wj, P), wi, jnp.int32)
        for _ in range(n_bits):
            mid = (lo + hi) // 2
            pxm = px_at(mid.astype(jnp.float32))
            comp = (pxm - xiT[:, None, :]) * d_abs[:, None, :] < rhs
            lo = jnp.where(comp, lo, mid + 1)
            hi = jnp.where(comp, mid, hi)
        big = jnp.int32(wi + 1)
        ne = lo.reshape(SB, Mb, wj, P)
        conds = cond.reshape(SB, Mb, wj, P)
        lo_i = jnp.min(jnp.where(conds, ne, big), axis=1)  # (SB, wj, P)
        hi_i = jnp.max(jnp.where(conds, ne, -1), axis=1)
        inside = (irow >= lo_i[None]) & (irow < hi_i[None])  # (wi,SB,wj,P)
        fail = jnp.any(inside & neg[:, None], axis=(0, 2))
        n = jnp.sum(inside & fin[:, None], axis=(0, 2))
        sm = jnp.sum(jnp.where(inside, winz[:, None], 0.0), axis=(0, 2))
        return fail, n, sm

    def block_verdict(fail, n, sm):
        ok = ~fail & jnp.where((n == 0) & ~fail, default != 0.0, True)
        trav = jnp.where(
            fail, 0.0, jnp.where(n == 0, default, sm / jnp.maximum(n, 1))
        )
        return ok, trav

    if not use_blocks:
        # one window per PATH, fetched once, reused by every segment block
        anchors = 0.5 * (
            jnp.max(positions[..., :2], axis=1)
            + jnp.min(positions[..., :2], axis=1)
        )
        win, gi0, pyT = fetch_window(anchors)
        # materialize: without the barrier XLA fuses the gather into the
        # segment scan body and re-fetches the window EVERY step (measured
        # 40x slower)
        win = jax.lax.optimization_barrier(win)
        planes = planes_of(win)

    # --- single-pose: the (convex) footprint polygon at pose 0 ----------
    h0 = jnp.broadcast_to(polys[:, 0:1], (P, _SEG_BLOCK, V, 2))
    if use_blocks:
        a0 = 0.5 * (jnp.max(polys[:, 0], axis=1) + jnp.min(polys[:, 0], axis=1))
        win0, gi00, pyT0 = fetch_window(a0)
        f0, n0, s0 = seg_block(h0, planes_of(win0), gi00, pyT0)
    else:
        f0, n0, s0 = seg_block(h0, planes, gi0, pyT)
    ok1, trav1 = block_verdict(f0[0], n0[0], s0[0])
    area1 = jax.vmap(polygon_area, in_axes=(0, None))(polys[:, 0], V)

    if N == 1:
        safe = ok1 & (n_poses >= 1)
        return safe, jnp.where(ok1, trav1, 0.0), jnp.where(ok1, area1, 0.0)

    # --- consecutive-pose hulls -----------------------------------------
    S = N - 1
    prev = polys[:, :-1]
    cur = polys[:, 1:]
    if conservative:
        d = (positions[:, 1:, :2] - positions[:, :-1, :2])[:, :, None, :]
        poly1 = jnp.concatenate([prev, cur - d], axis=2)
        poly2 = jnp.concatenate([cur, prev + d], axis=2)
    else:
        poly1 = prev
        poly2 = cur
    Mv = poly1.shape[2]
    if translate_only and not conservative:
        d2 = positions[:, 1:, :2] - positions[:, :-1, :2]
        hseg, _ = swept_hull_translates(prev, cur, footprint, d2)  # (P,S,2V,2)
    else:
        points = jnp.concatenate([poly1, poly2], axis=2)
        hulls, _n_hull = convex_hull_batch(
            points.reshape(P * S, 2 * Mv, 2),
            jnp.full((P * S,), 2 * Mv, jnp.int32),
        )
        # padding repeats the first hull vertex: full-M wrap then closes the
        # ring with one real edge + zero-length no-ops, so n_hull is not
        # needed downstream
        hseg = hulls.reshape(P, S, 2 * Mv, 2)
    Mh = hseg.shape[2]

    Sp = -(-S // _SEG_BLOCK) * _SEG_BLOCK
    hpad = hseg
    if Sp > S:
        hpad = jnp.concatenate(
            [hseg, jnp.broadcast_to(hseg[:, -1:], (P, Sp - S, Mh, 2))], axis=1
        )
    blocks = jnp.moveaxis(
        hpad.reshape(P, Sp // _SEG_BLOCK, _SEG_BLOCK, Mh, 2), 1, 0
    )
    if use_blocks:
        # per-(path, block) windows anchored at each block's hull bbox
        # center; the static (wi, wj) from path_block_window covers every
        # block by construction
        banch = 0.5 * (
            jnp.max(blocks, axis=(2, 3)) + jnp.min(blocks, axis=(2, 3))
        )  # (B, P, 2)

        def body(c, xs):
            hb, anc = xs
            winb, gib, pyb = fetch_window(anc)
            return c, seg_block(hb, planes_of(winb), gib, pyb)

        _, (fail, n, sm) = jax.lax.scan(body, 0, (blocks, banch))
    else:
        _, (fail, n, sm) = jax.lax.scan(
            lambda c, hb: (c, seg_block(hb, planes, gi0, pyT)), 0, blocks
        )
    fail = fail.reshape(Sp, P)[:S].T  # (P, S)
    n = n.reshape(Sp, P)[:S].T
    sm = sm.reshape(Sp, P)[:S].T
    seg_ok, seg_trav = block_verdict(fail, n, sm)

    hull_area = jax.vmap(polygon_area, in_axes=(0, None))(
        hseg.reshape(P * S, Mh, 2), Mh
    ).reshape(P, S)
    poly1_area = jax.vmap(polygon_area, in_axes=(0, None))(
        poly1.reshape(P * S, Mv, 2), Mv
    ).reshape(P, S)

    seg_valid = jnp.arange(1, N)[None, :] < n_poses[:, None]
    multi_ok = jnp.all(seg_ok | ~seg_valid, axis=-1)
    first_w = hull_area[:, 0]
    later_w = hull_area[:, 1:] - poly1_area[:, 1:]
    weights = jnp.concatenate([first_w[:, None], later_w], axis=1)
    weights = jnp.where(seg_valid, weights, 0.0)
    total_area = jnp.sum(weights, axis=-1)
    trav_multi = jnp.sum(weights * seg_trav, axis=-1) / jnp.where(
        total_area != 0.0, total_area, 1.0
    )
    is_single = n_poses == 1
    safe = jnp.where(is_single, ok1, multi_ok) & (n_poses >= 1)
    trav = jnp.where(is_single, jnp.where(ok1, trav1, 0.0), trav_multi)
    area = jnp.where(is_single, jnp.where(ok1, area1, 0.0), total_area)
    trav = jnp.where(safe, trav, 0.0)
    area = jnp.where(safe | is_single, area, 0.0)
    return safe, trav, area


def dense_polygon_field(
    state: QueryState, vertices_origin: np.ndarray
) -> Tuple[Array, Array]:
    """Per-cell polygonal footprint verdict for the polygon placed (without
    further rotation) at every CELL CENTER — the traversabilityFootprint
    service workload (TraversabilityMap.cpp:239-305), gather-free.

    The relative cell offsets covered by the polygon are static (the same
    crossing-number rule as PolygonIterator, evaluated host-side in float64),
    so the whole layer is a handful of shifted reductions.

    vertices_origin: (V, 2) numpy polygon in the base frame (origin-centred).
    Returns (ok (H, W) bool, trav (H, W) f32).
    """
    from traversability_estimation_tpu.ops.filters import _shifted
    from traversability_estimation_tpu.oracle.footprint import _point_in_polygon

    verts = np.asarray(vertices_origin, np.float64)
    res = state.resolution
    reach = int(math.ceil(np.abs(verts).max() / res)) + 1
    offs = []
    for di in range(-reach, reach + 1):
        for dj in range(-reach, reach + 1):
            if _point_in_polygon(verts, np.array([-di * res, -dj * res])):
                offs.append((di, dj))

    fail_plane = ~state.traversable_mask
    tv = jnp.where(
        jnp.isfinite(state.traversability),
        state.traversability,
        state.default_traversability,
    )
    H, W = state.shape
    fail = jnp.zeros((H, W), bool)
    n = jnp.zeros((H, W), jnp.float32)
    s = jnp.zeros((H, W), jnp.float32)
    ones = jnp.ones((H, W), jnp.float32)
    tv_pass = jnp.where(fail_plane, 0.0, tv)
    pass_plane = jnp.where(fail_plane, 0.0, 1.0)
    for di, dj in offs:
        fail = fail | _shifted(fail_plane, di, dj, False)
        n = n + _shifted(pass_plane, di, dj, 0.0)
        s = s + _shifted(tv_pass, di, dj, 0.0)
    default = jnp.float32(state.default_traversability)
    empty = (n == 0.0) & ~fail
    ok = ~fail & jnp.where(empty, default != 0.0, True)
    trav = jnp.where(fail, 0.0, jnp.where(empty, default, s / jnp.maximum(n, 1.0)))
    return ok, trav.astype(jnp.float32)


def polygon_window_cells(
    footprint: np.ndarray,
    max_segment_length: float,
    resolution: float,
    conservative: bool = False,
    identity_orientation: bool = False,
):
    """Static raster window covering any consecutive-footprint hull.

    Returns a square int sized by the footprint circumradius; with
    `identity_orientation` (no pose rotates the footprint) a tight (wi, wj)
    rectangle from the per-axis extents instead — ~2x less gather volume for
    the shipped 0.9 x 0.6 m footprint.

    Cell counts are bucketed up to multiples of 4: the window is a static jit
    shape, so bucketing bounds the number of recompiles across batches whose
    longest segment jitters (a larger window never changes results)."""
    fp = np.asarray(footprint, np.float64)
    grow = (1.5 if conservative else 0.5) * max_segment_length

    def cells(reach):
        c = 2 * int(math.ceil(reach / resolution)) + 3
        return ((c + 3) // 4) * 4

    if identity_orientation:
        return (
            cells(float(np.abs(fp[:, 0]).max()) + grow),
            cells(float(np.abs(fp[:, 1]).max()) + grow),
        )
    return cells(float(np.max(np.linalg.norm(fp, axis=1))) + grow)
