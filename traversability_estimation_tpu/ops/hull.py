"""Batched convex hull on device (Andrew monotone chain).

Replaces grid_map's ``Polygon::convexHull`` / ``monotoneChainConvexHullOfPoints``
(used by the reference's polygonal path checker at
/root/reference/traversability_estimation/src/TraversabilityMap.cpp:546,638)
with a fixed-size, vmappable implementation: point sets are padded to a static
M, the chain is a ``lax.scan`` over points with a ``lax.while_loop`` pop stack.
Collinear points are dropped (cross <= 0 popped), counter-clockwise output —
same convention as grid_map.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _half_hull(seq: Array, n_valid: Array) -> Tuple[Array, Array]:
    """One monotone-chain pass over `seq` ((M,2), first n_valid real)."""
    M = seq.shape[0]
    stack0 = jnp.zeros((M + 1, 2), seq.dtype)

    def body(carry, xs):
        stack, k = carry
        p, i = xs

        def cond_fn(c):
            st, kk = c
            a = jax.lax.dynamic_slice(st, (kk - 2, 0), (1, 2))[0]
            b = jax.lax.dynamic_slice(st, (kk - 1, 0), (1, 2))[0]
            return (kk >= 2) & (_cross(a, b, p) <= 0.0)

        def body_fn(c):
            st, kk = c
            return st, kk - 1

        valid = i < n_valid
        stack, k = jax.lax.cond(
            valid,
            lambda c: jax.lax.while_loop(cond_fn, body_fn, c),
            lambda c: c,
            (stack, k),
        )
        stack = jnp.where(valid, jax.lax.dynamic_update_slice(stack, p[None, :], (k, 0)), stack)
        k = jnp.where(valid, k + 1, k)
        return (stack, k), None

    idx = jnp.arange(M, dtype=jnp.int32)
    (stack, k), _ = jax.lax.scan(body, (stack0, jnp.int32(0)), (seq, idx))
    return stack, k


def convex_hull(points: Array, n_valid) -> Tuple[Array, Array]:
    """Convex hull of (M, 2) points (first `n_valid` real).

    Returns (hull (2M, 2), n_hull): counter-clockwise hull vertices, padded by
    repeating the first vertex (safe for crossing-number tests and shoelace
    area, both of which mask by n_hull anyway).

    Parity note: grid_map returns point sets of size <= 3 unchanged; callers
    here always pass >= 4 points (two footprints), so the chain always runs.
    """
    M = points.shape[0]
    n_valid = jnp.asarray(n_valid, jnp.int32)
    # lexicographic sort (x, then y); push padded entries to the end
    big = jnp.float32(3e38)
    px = jnp.where(jnp.arange(M) < n_valid, points[:, 0], big)
    py = jnp.where(jnp.arange(M) < n_valid, points[:, 1], big)
    order = jnp.lexsort((py, px))
    sorted_pts = points[order]

    lower, kl = _half_hull(sorted_pts, n_valid)
    upper, ku = _half_hull(sorted_pts[::-1], n_valid)

    out = jnp.zeros((2 * M, 2), points.dtype)
    # lower[:kl-1] ++ upper[:ku-1]
    idx = jnp.arange(2 * M, dtype=jnp.int32)
    n_low = jnp.maximum(kl - 1, 0)
    n_up = jnp.maximum(ku - 1, 0)
    n_hull = n_low + n_up
    src_low = jnp.clip(idx, 0, M)
    src_up = jnp.clip(idx - n_low, 0, M)
    vals = jnp.where(
        (idx < n_low)[:, None],
        lower[src_low],
        upper[src_up],
    )
    first = vals[0]
    out = jnp.where((idx < n_hull)[:, None], vals, first[None, :])
    # degenerate: all points identical -> n_hull can be 0; report 1 vertex
    out = jnp.where(n_hull > 0, out, jnp.broadcast_to(sorted_pts[0], out.shape))
    n_hull = jnp.maximum(n_hull, 1)
    return out, n_hull


convex_hull_batch = jax.vmap(convex_hull, in_axes=(0, 0), out_axes=(0, 0))
