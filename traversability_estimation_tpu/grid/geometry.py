"""grid_map iterator semantics, re-expressed as static orderings and masks.

The reference walks cells with stateful C++ iterators (GridMapIterator,
CircleIterator, SpiralIterator, LineIterator, PolygonIterator from
grid_map_core — used e.g. at
/root/reference/traversability_estimation/src/TraversabilityMap.cpp:404,600,687
and traversability_estimation_filters/src/StepFilter.cpp:124). On TPU the same
semantics become:

- circle   -> a static list of integer cell offsets (host-precomputed);
- spiral   -> a static *ordered* list of offsets reproducing grid_map's exact
              ring-walk visit order (needed because the reference's early-exit
              footprint logic is order-dependent within the last ring);
- line     -> Bresenham in closed form, evaluable for a whole batch of
              endpoint pairs inside jit;
- polygon  -> a crossing-number inside test over a window of candidate cells.

Host builders return NumPy arrays (static, hashable inputs -> cacheable);
device functions are jnp and jit/vmap friendly.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Circle windows (CircleIterator parity)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def circle_offsets(radius: float, resolution: float) -> np.ndarray:
    """Integer index offsets of cells whose center lies within `radius` of the
    center cell's center. (K, 2) int32, includes (0, 0) when radius >= 0.

    Parity: grid_map CircleIterator includes a cell iff
    ``(cell_position - center).squaredNorm() <= radius^2`` — evaluated here in
    float64 at cell-center distances, which is exact for center-cell queries
    (the only way the reference's filters use it).
    """
    n = int(math.floor(radius / resolution + 1e-9)) + 1
    offs = []
    r2 = float(radius) * float(radius)
    for di in range(-n, n + 1):
        for dj in range(-n, n + 1):
            d2 = (di * resolution) ** 2 + (dj * resolution) ** 2
            if d2 <= r2 + 1e-12:
                offs.append((di, dj))
    if not offs:
        offs.append((0, 0))
    return np.asarray(offs, dtype=np.int32)


# ---------------------------------------------------------------------------
# Spiral ordering (SpiralIterator parity)
# ---------------------------------------------------------------------------


def _signum(x: int) -> int:
    return (x > 0) - (x < 0)


@functools.lru_cache(maxsize=None)
def spiral_order(radius: float, resolution: float) -> Tuple[np.ndarray, np.ndarray]:
    """Exact grid_map SpiralIterator visit order as static offsets.

    Returns ``(offsets (K,2) int32, ring (K,) int32)`` where `ring` is the
    integer ring distance of each offset (0 for the center). Visit order is:
    center first, then ring d = 1, 2, ... nRings, each ring walked exactly the
    way grid_map's ``generateRing`` walks it (start at (+d, 0), step along the
    ring keeping integer-rounded Euclidean norm equal to d).

    For the two outermost rings (d == nRings or nRings-1) grid_map re-checks
    true Euclidean inclusion against the (sub-cell accurate) query center; that
    check depends on the query position and is applied at lookup time by the
    footprint evaluator — here we emit ALL candidates of those rings and tag
    them via `ring` so the evaluator can mask them.

    The per-cell radius reported by the iterator (used by the reference's
    radius-inflation logic, TraversabilityMap.cpp:691) is
    ``norm(offset) * resolution`` and is recomputed cheaply from `offsets`.
    """
    n_rings = int(math.ceil(radius / resolution - 1e-12))
    offsets = [(0, 0)]
    rings = [0]
    for d in range(1, n_rings + 1):
        px, py = d, 0
        while True:
            offsets.append((px, py))
            rings.append(d)
            nx, ny = -_signum(py), _signum(px)
            # grid_map generateRing stepping rule: prefer the single-axis step
            # that keeps int(norm) == d, else step diagonally.
            if nx != 0 and int(math.sqrt((px + nx) ** 2 + py**2)) == d:
                px += nx
            elif ny != 0 and int(math.sqrt(px**2 + (py + ny) ** 2)) == d:
                py += ny
            else:
                px += nx
                py += ny
            if px == d and py == 0:
                break
    return np.asarray(offsets, dtype=np.int32), np.asarray(rings, dtype=np.int32)


# ---------------------------------------------------------------------------
# Line rasterization (LineIterator parity, closed form)
# ---------------------------------------------------------------------------


def line_cells_np(start: np.ndarray, end: np.ndarray) -> np.ndarray:
    """Host Bresenham with grid_map LineIterator parity: cells from start to
    end inclusive, ``n = max(|di|,|dj|) + 1`` cells."""
    start = np.asarray(start, dtype=np.int64)
    end = np.asarray(end, dtype=np.int64)
    delta = np.abs(end - start)
    sign = np.where(end >= start, 1, -1)
    if delta[0] >= delta[1]:
        denom, num_add = delta[0], delta[1]
        inc_main = np.array([sign[0], 0])
        inc_over = np.array([0, sign[1]])
    else:
        denom, num_add = delta[1], delta[0]
        inc_main = np.array([0, sign[1]])
        inc_over = np.array([sign[0], 0])
    if denom == 0:
        return start[None, :].astype(np.int32)
    n = int(denom) + 1
    k = np.arange(n)
    num0 = denom // 2
    # overflow count after k numerator increments
    over = (num0 + k * num_add) // denom
    cells = start[None, :] + inc_main[None, :] * k[:, None] + inc_over[None, :] * over[:, None]
    return cells.astype(np.int32)


def line_cells_batch(start_idx: jnp.ndarray, end_idx: jnp.ndarray, max_cells: int):
    """Device Bresenham for batches of index pairs, static length `max_cells`.

    Args:
      start_idx, end_idx: (..., 2) int32 cell indices.
      max_cells: static upper bound on line length in cells.

    Returns:
      cells: (..., max_cells, 2) int32, cells along each line (clamped order,
        padded by repeating the end cell);
      valid: (..., max_cells) bool, True for the real ``max(|d|)+1`` cells.

    Matches grid_map's LineIterator exactly: classic integer Bresenham with
    the numerator initialized to ``denom // 2``.
    """
    start_idx = jnp.asarray(start_idx, jnp.int32)
    end_idx = jnp.asarray(end_idx, jnp.int32)
    delta = jnp.abs(end_idx - start_idx)
    sign = jnp.where(end_idx >= start_idx, 1, -1).astype(jnp.int32)
    x_dom = delta[..., 0] >= delta[..., 1]
    denom = jnp.where(x_dom, delta[..., 0], delta[..., 1])
    num_add = jnp.where(x_dom, delta[..., 1], delta[..., 0])
    zero = jnp.zeros_like(sign[..., 0])
    inc_main = jnp.stack(
        [jnp.where(x_dom, sign[..., 0], zero), jnp.where(x_dom, zero, sign[..., 1])],
        axis=-1,
    )
    inc_over = jnp.stack(
        [jnp.where(x_dom, zero, sign[..., 0]), jnp.where(x_dom, sign[..., 1], zero)],
        axis=-1,
    )
    k = jnp.arange(max_cells, dtype=jnp.int32)
    bshape = denom.shape
    k = k.reshape((1,) * len(bshape) + (max_cells,))
    denom_e = denom[..., None]
    num_add_e = num_add[..., None]
    safe_denom = jnp.maximum(denom_e, 1)
    num0 = denom_e // 2
    over_before = (num0 + k * num_add_e) // safe_denom  # overflow count before step k
    over_before = jnp.where(k == 0, 0, over_before)
    cells = (
        start_idx[..., None, :]
        + inc_main[..., None, :] * k[..., None]
        + inc_over[..., None, :] * over_before[..., None]
    )
    valid = k < (denom_e + 1)
    n_real = denom_e[..., 0] + 1
    end_b = jnp.broadcast_to(end_idx[..., None, :], cells.shape)
    cells = jnp.where(valid[..., None], cells, end_b)
    return cells, valid, n_real


# ---------------------------------------------------------------------------
# Polygon tests (Polygon::isInside / PolygonIterator parity)
# ---------------------------------------------------------------------------


def polygon_contains(vertices: jnp.ndarray, n_vertices, points: jnp.ndarray) -> jnp.ndarray:
    """Crossing-number point-in-polygon, grid_map Polygon::isInside parity.

    Args:
      vertices: (V, 2) float polygon vertices (padded entries allowed past
        ``n_vertices``; they must duplicate a real vertex or be arbitrary —
        they are masked out).
      n_vertices: scalar int, number of real vertices.
      points: (..., 2) query points.

    Returns: (...) bool.
    """
    V = vertices.shape[0]
    idx = jnp.arange(V)
    nv = jnp.asarray(n_vertices, jnp.int32)
    jdx = jnp.where(idx == 0, nv - 1, idx - 1)  # previous vertex (wraps)
    vi = vertices  # (V, 2)
    vj = vertices[jdx]  # (V, 2)
    px = points[..., None, 0]  # (..., V)
    py = points[..., None, 1]
    yi, yj = vi[..., 1], vj[..., 1]
    xi, xj = vi[..., 0], vj[..., 0]
    cond = (yi > py) != (yj > py)
    denom = yj - yi
    # division-free form of px < (xj-xi)*(py-yi)/denom + xi: multiply both
    # sides by denom, flipping the comparison for negative denom (denom == 0
    # is excluded by `cond`). ~2x faster on the VPU for big hull batches.
    lhs = (px - xi) * denom
    rhs = (xj - xi) * (py - yi)
    crossing = cond & jnp.where(denom > 0.0, lhs < rhs, lhs > rhs) & (idx < nv)
    return jnp.sum(crossing.astype(jnp.int32), axis=-1) % 2 == 1


def polygon_area(vertices: jnp.ndarray, n_vertices) -> jnp.ndarray:
    """Shoelace area with grid_map Polygon::getArea parity (abs value)."""
    V = vertices.shape[0]
    idx = jnp.arange(V)
    nv = jnp.asarray(n_vertices, jnp.int32)
    jdx = jnp.where(idx == 0, nv - 1, idx - 1)
    vi = vertices
    vj = vertices[jdx]
    terms = (vj[:, 0] + vi[:, 0]) * (vj[:, 1] - vi[:, 1])
    terms = jnp.where(idx < nv, terms, 0.0)
    return jnp.abs(jnp.sum(terms) / 2.0)


def polygon_from_circle(center: np.ndarray, radius: float, n: int = 20) -> np.ndarray:
    """grid_map Polygon::fromCircle parity: n-gon approximation (n=20)."""
    angles = np.arange(n) * (2.0 * np.pi / n)
    pts = np.stack(
        [center[0] + radius * np.cos(angles), center[1] + radius * np.sin(angles)],
        axis=-1,
    )
    return pts


# ---------------------------------------------------------------------------
# Convex hull (monotoneChainConvexHullOfPoints parity) — host version
# ---------------------------------------------------------------------------


def convex_hull_np(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain, grid_map parity: collinear points removed
    (cross <= 0 popped); points returned in counter-clockwise order. Inputs
    with <= 3 points are returned unchanged (grid_map does the same)."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) <= 3:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    p = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for q in p:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], q) <= 0:
            lower.pop()
        lower.append(q)
    upper: list = []
    for q in p[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], q) <= 0:
            upper.pop()
        upper.append(q)
    return np.asarray(lower[:-1] + upper[:-1])
