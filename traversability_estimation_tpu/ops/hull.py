"""Batched convex hull on device — branchless, TPU-native.

Replaces grid_map's ``Polygon::convexHull`` / ``monotoneChainConvexHullOfPoints``
(used by the reference's polygonal path checker at
/root/reference/traversability_estimation/src/TraversabilityMap.cpp:546,638).

A sequential monotone chain (sort + pop-stack) lowers catastrophically on TPU
(per-element while_loops). Instead, for the small point sets here (two
footprints, M <= 32):

1. edge-validity matrix: directed edge i->j is a hull edge iff every other
   point k lies strictly left of it; collinear points are allowed only
   between i and j (keeps the longest collinear edge, matching grid_map's
   collinear-popping), and exact duplicates are deduplicated by lowest index.
   O(M^3) fully-vectorized VPU ops, no control flow.
2. successor walk: hull vertices in CCW order by following the unique valid
   outgoing edge M times (M vectorized steps over the whole batch).

Output matches the monotone chain: CCW order, collinear points dropped,
padding repeats the first hull vertex (safe for crossing tests and shoelace).
"""

from __future__ import annotations


from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def hull_edge_matrix(points: Array, valid: Array) -> Array:
    """(.., M, M) bool: directed hull edges of the valid points.

    points: (..., M, 2); valid: (..., M) bool mask of real points.
    """
    px = points[..., 0]
    py = points[..., 1]
    # cross((j - i), (k - i)) for all i, j, k
    jx = px[..., None, :, None] - px[..., :, None, None]  # (.., i, j, 1)
    jy = py[..., None, :, None] - py[..., :, None, None]
    kx = px[..., None, None, :] - px[..., :, None, None]  # (.., i, 1, k)
    ky = py[..., None, None, :] - py[..., :, None, None]
    cross = jx * ky - jy * kx  # (.., i, j, k)
    dot = jx * kx + jy * ky
    len2 = jx * jx + jy * jy  # |j - i|^2, broadcast over k

    # TOLERANCE-BANDED collinearity instead of exact `cross == 0`: upstream
    # vertex coordinates are only reproducible to ~1 ulp across jit contexts
    # (XLA FMA contraction varies with the fusion neighborhood), and an exact
    # test lets that last bit flip edge classifications inconsistently —
    # observed as corrupted successor walks (no valid cycle) under shard_map.
    # The band scales with |j-i||k-i| (the cross product's magnitude scale):
    # points within ~3e-6 rad of an edge count as collinear — ~25x above f32
    # rounding noise (~1.2e-7 relative) yet narrow enough that genuinely
    # distinct geometry is never merged. (The round-1 band of 1e-4 was wide
    # enough to swallow real features: a path segment deviating ~1e-4 rad
    # from a footprint edge direction produced a corrupted successor walk and
    # a hull LARGER than the true one — caught by
    # tests/test_footprint.py::TestSweptHullTranslates.)
    k_len2 = kx * kx + ky * ky
    eps = 3e-6 * jnp.sqrt(len2 * k_len2) + 1e-30
    left = cross > eps
    # near-collinear k allowed only when between i and j (inclusive, with the
    # same tolerance along the edge)
    between = (jnp.abs(cross) <= eps) & (dot >= -eps) & (dot <= len2 + eps)
    k_ok = left | between | ~valid[..., None, None, :]
    all_ok = jnp.all(k_ok, axis=-1)  # (.., i, j)

    # duplicate dedup: if any k < i equals point i (or k < j equals j), the
    # lower-index copy owns the edge
    M = points.shape[-2]
    same = (px[..., :, None] == px[..., None, :]) & (
        py[..., :, None] == py[..., None, :]
    )  # (.., a, b)
    idx = jnp.arange(M)
    lower = idx[:, None] > idx[None, :]  # (a, b): b < a
    dup_before = jnp.any(same & lower & valid[..., None, :], axis=-1)  # (.., a)
    ok = (
        all_ok
        & valid[..., :, None]
        & valid[..., None, :]
        & ~dup_before[..., :, None]
        & ~dup_before[..., None, :]
        & ~same  # no self edges or zero-length duplicate-pair edges
    )
    return ok


def convex_hull(points: Array, n_valid) -> Tuple[Array, Array]:
    """Convex hull of (M, 2) points (first `n_valid` real).

    Returns (hull (M, 2) CCW, n_hull), padded by repeating the first hull
    vertex. Degenerate inputs (all points collinear/identical) return a
    1-2 vertex "hull" — crossing tests then reject everything and shoelace
    area is 0, matching the degenerate-polygon behavior downstream.

    The successor walk runs on ONE-HOT vectors (o_{t+1} = o_t @ E, vertex
    emission = O @ points): batched gathers cost ~2.9 ns per element on this
    chip and dominated the old index-walk formulation (measured 6.2 ms for
    50k 8-point hulls — the rotated polygonal evaluator's single largest
    stage); the matmul walk does the same work in VPU FMAs with zero
    gathers.
    """
    M = points.shape[0]
    valid = jnp.arange(M) < jnp.asarray(n_valid, jnp.int32)
    edges = hull_edge_matrix(points, valid)  # (M, M)

    has_out = jnp.any(edges, axis=-1)  # hull vertices
    # any hull vertex starts the (unique) cycle; first-by-index is
    # deterministic, and crossing tests/shoelace are rotation-invariant.
    # one-hot of the first hull vertex; all-degenerate inputs (no hull
    # edges at all) fall back to vertex 0, whose self-loop below emits
    # point 0 repeated — the 1-vertex "hull"
    first_out = has_out & (jnp.cumsum(has_out) == 1)
    any_out = jnp.any(has_out)
    start1 = jnp.where(
        any_out, first_out, jnp.arange(M) == 0
    ).astype(jnp.float32)  # (M,)

    # one-hot each row to its FIRST outgoing edge (argmax semantics): with
    # duplicate-heavy inputs (e.g. the conservative sweep, where cur - d ==
    # prev exactly) the tolerance band can validate more than one outgoing
    # edge per vertex, and a multi-hot row would corrupt the matmul walk.
    # Rows with no outgoing edge can only be reached in the degenerate
    # case; self-loop them onto the start so the walk stays put there.
    succ1 = edges & (jnp.cumsum(edges, axis=-1) == 1)
    E = jnp.where(
        has_out[:, None], succ1.astype(jnp.float32), start1[None, :]
    )  # (M, M) row-stochastic 0/1

    # precision: TPU matmuls default to bf16 operands. The 0/1 walk matmuls
    # (o @ E, O @ start1) are EXACT in bf16 and keep the default; the
    # vertex EMISSION must keep full f32 coordinate bits (bf16's ~2^-8
    # relative error is whole cells at 50 m map frame — invisible to CPU
    # tests), so it is a broadcast multiply-reduce on the VPU instead of a
    # dot (exact, and cheaper than a Precision.HIGHEST 3-pass matmul at
    # these tiny shapes — that variant measured +0.6 ms on the 50k-hull
    # batch).
    def step(o, _):
        return o @ E, o

    _, O = jax.lax.scan(step, start1, None, length=M)  # (M steps, M)
    # (M steps, M) one-hot rows x (M, 2) points -> (M, 2) walk vertices
    hull = jnp.sum(O[:, :, None] * points[None, :, :], axis=1)
    # n_hull: first return to start after step 0
    back = (O @ start1 > 0.5) & (jnp.arange(M) > 0)
    n_hull = jnp.where(jnp.any(back), jnp.argmax(back), jnp.int32(M))
    n_hull = jnp.maximum(n_hull, 1)
    first = hull[0]
    hull = jnp.where((jnp.arange(M) < n_hull)[:, None], hull, first[None, :])
    return hull, n_hull


convex_hull_batch = jax.vmap(convex_hull, in_axes=(0, 0), out_axes=(0, 0))
