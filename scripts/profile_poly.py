"""Stage-level profile of the polygonal path evaluator on the real chip.

VERDICT r1 weak #1: polygonal path throughput (bench config 3's swept-hull
variant) sits at 26x the native baseline vs the >=100x target, and no profile
says whether the O(M^3) hull edge matrix, the crossing-number inside test,
the span-extraction scans, or the prefix gathers dominate. This script times
each stage in isolation with the same chained-scan device-timing discipline
as bench.py (the host reaches the chip through a ~24 ms tunnel, so every
measurement chains K iterations inside one jit and subtracts the RTT).

Run: python scripts/profile_poly.py            (real chip)
     JAX_PLATFORMS=cpu python scripts/profile_poly.py   (host smoke)
"""

from __future__ import annotations

import json
import statistics
import os
import sys
import time

import numpy as np

# self-bootstrap: run from a fresh checkout without installing the package.
# APPEND (never overwrite PYTHONPATH / prepend): this host's TPU plugin lives
# on PYTHONPATH and must keep winning import resolution.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.append(_REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from bench import make_paths, synthetic_terrain
    from traversability_estimation_tpu.models import TraversabilityEstimator
    from traversability_estimation_tpu.ops import footprint as fp_ops
    from traversability_estimation_tpu.ops.hull import convex_hull_batch
    from traversability_estimation_tpu.utils.config import EstimatorConfig

    log("devices:", jax.devices())
    res = 0.03
    H = W = 336
    elev = synthetic_terrain(H, W, res, seed=1)
    est = TraversabilityEstimator(EstimatorConfig(resolution=res))
    est.update(elev)
    state = est.query_state

    rng = np.random.default_rng(3)
    P, N = 1024, 50
    extent = H * res / 2 * 0.8
    poses = make_paths(rng, P, N, extent)
    footprint = np.asarray(est.config.footprint.footprint_polygon, np.float32)
    seg = np.linalg.norm(np.diff(poses, axis=1), axis=-1)
    window = fp_ops.polygon_window_cells(
        footprint, float(seg.max()), res, False, identity_orientation=True
    )
    log(f"window: {window}")
    pos3 = jnp.asarray(np.concatenate([poses, np.zeros((P, N, 1), np.float32)], -1))
    quats = np.zeros((P, N, 4), np.float32)
    quats[..., 3] = 1.0
    quats_dev = jnp.asarray(quats)
    n_poses = jnp.asarray(np.full((P,), N, np.int32))

    # transport RTT
    _probe = jax.jit(lambda a: a + 1.0)
    _x = jnp.ones((8, 8))
    np.asarray(_probe(_x))
    rtts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(_probe(_x))
        rtts.append(time.perf_counter() - t)
    RTT = statistics.median(rtts)
    log(f"transport RTT: {RTT*1e3:.1f} ms")

    def timed(name, fn, arg, K):
        looped = jax.jit(
            lambda a: jax.lax.scan(lambda c, _: (fn(c), None), a, None, length=K)[0]
        )
        out = looped(arg)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(looped(arg))
        wall = time.perf_counter() - t0
        dt = max(wall - RTT, 1e-9) / K
        log(f"{name:34s} {dt*1e3:8.3f} ms")
        return dt

    results = {}
    V = footprint.shape[0]

    # --- stage 1: pose transform -> footprint polygons ----------------------
    def s1(p):
        polys = fp_ops.transform_footprint(jnp.asarray(footprint), p, quats_dev)
        return p + 1e-12 * polys[0, 0, 0, 0]

    results["transform"] = timed("S1 transform_footprint", s1, pos3, 16)

    # --- stage 2: hull build (the O(M^3) edge matrix + successor walk) ------
    polys0 = fp_ops.transform_footprint(jnp.asarray(footprint), pos3, quats_dev)
    points = jnp.concatenate([polys0[:, :-1], polys0[:, 1:]], axis=2).reshape(
        P * (N - 1), 2 * V, 2
    )
    n_valid = jnp.full((P * (N - 1),), 2 * V, jnp.int32)

    def s2(pts):
        hulls, n_hull = convex_hull_batch(pts, n_valid)
        return pts + 1e-12 * (hulls[0, 0, 0] + n_hull[0])

    results["hull_build"] = timed("S2 convex_hull_batch (50k x 8pts)", s2, points, 8)

    # --- stage 3: convex polygon check (inside test + spans + gathers) ------
    hulls0, n_hull0 = convex_hull_batch(points, n_valid)
    mids = 0.5 * (pos3[:, 1:, :2] + pos3[:, :-1, :2]).reshape(P * (N - 1), 2)

    def s3(h):
        ok, trav, n = fp_ops.check_convex_polygons(state, h, n_hull0, mids, window)
        return h + 1e-12 * (trav[0] + n[0])

    results["convex_check"] = timed("S3 check_convex_polygons", s3, hulls0, 8)

    # --- stage 3a: inside test + span extraction only (no prefix gathers) ---
    from traversability_estimation_tpu.grid.geometry import polygon_contains

    wi, wj = (window, window) if isinstance(window, int) else window
    half_i, half_j = wi // 2, wj // 2

    def spans_only(vertices, n_vertices, anchors):
        Hm, Wm = state.shape
        anchor_idx = fp_ops._index_of(state, anchors)
        gi = anchor_idx[:, 0:1] + (jnp.arange(wi, dtype=jnp.int32) - half_i)
        gj = anchor_idx[:, 1:2] + (jnp.arange(wj, dtype=jnp.int32) - half_j)
        p0 = fp_ops._origin_offset(state)
        px = p0[0] - (gi.astype(jnp.float32) + 0.5) * state.resolution
        py = p0[1] - (gj.astype(jnp.float32) + 0.5) * state.resolution
        cell_pos = jnp.stack(
            [
                jnp.broadcast_to(px[:, :, None], (px.shape[0], wi, wj)),
                jnp.broadcast_to(py[:, None, :], (py.shape[0], wi, wj)),
            ],
            axis=-1,
        )
        inside = jax.vmap(polygon_contains)(vertices, n_vertices, cell_pos)
        any_row = jnp.any(inside, axis=-1)
        j_first = jnp.argmax(inside, axis=-1).astype(jnp.int32)
        j_last = wj - 1 - jnp.argmax(inside[..., ::-1], axis=-1).astype(jnp.int32)
        g0 = jnp.clip(gj[:, 0:1] + j_first, 0, Wm)
        g1 = jnp.clip(gj[:, 0:1] + j_last + 1, 0, Wm)
        return g0, g1, any_row

    def s3a(h):
        g0, g1, any_row = spans_only(h, n_hull0, mids)
        return h + 1e-12 * (g0[0, 0] + g1[0, 0] + any_row[0, 0])

    results["inside_spans"] = timed("S3a inside test + span extract", s3a, hulls0, 8)

    # --- stage 3a': inside test alone ---------------------------------------
    def s3i(h):
        Hm, Wm = state.shape
        anchor_idx = fp_ops._index_of(state, mids)
        gi = anchor_idx[:, 0:1] + (jnp.arange(wi, dtype=jnp.int32) - half_i)
        gj = anchor_idx[:, 1:2] + (jnp.arange(wj, dtype=jnp.int32) - half_j)
        p0 = fp_ops._origin_offset(state)
        px = p0[0] - (gi.astype(jnp.float32) + 0.5) * state.resolution
        py = p0[1] - (gj.astype(jnp.float32) + 0.5) * state.resolution
        cell_pos = jnp.stack(
            [
                jnp.broadcast_to(px[:, :, None], (px.shape[0], wi, wj)),
                jnp.broadcast_to(py[:, None, :], (py.shape[0], wi, wj)),
            ],
            axis=-1,
        )
        inside = jax.vmap(polygon_contains)(h, n_hull0, cell_pos)
        return h + 1e-12 * jnp.sum(inside[0, :, 0].astype(jnp.float32))

    results["inside_only"] = timed("S3a' crossing-number inside only", s3i, hulls0, 8)

    # --- stage 3b: prefix gathers with precomputed spans ---------------------
    g0_0, g1_0, any_row_0 = jax.jit(spans_only)(hulls0, n_hull0, mids)
    anchor_idx0 = jax.jit(lambda a: fp_ops._index_of(state, a))(mids)
    gi0 = anchor_idx0[:, 0:1] + (jnp.arange(wi, dtype=jnp.int32) - half_i)

    def s3b(g0):
        Hm, Wm = state.shape
        row_ok = any_row_0 & (gi0 >= 0) & (gi0 < Hm) & (g1_0 > g0)
        row = jnp.clip(gi0, 0, Hm - 1)
        counts_p, tv_p = fp_ops.polygon_prefix_planes(state)
        Wp = Wm + 1
        lin0 = row * Wp + jnp.where(row_ok, g0, 0)
        lin1 = row * Wp + jnp.where(row_ok, g1_0, 0)
        combo = jnp.stack(
            [jax.lax.bitcast_convert_type(counts_p, jnp.float32), tv_p], axis=-1
        ).reshape(-1, 2)
        v0 = jnp.take(combo, lin0, axis=0)
        v1 = jnp.take(combo, lin1, axis=0)
        c0 = jax.lax.bitcast_convert_type(v0[..., 0], jnp.int32)
        c1 = jax.lax.bitcast_convert_type(v1[..., 0], jnp.int32)
        dc = jnp.where(row_ok, c1 - c0, 0)
        fail_cnt = dc // 65536
        tv_sum = jnp.where(row_ok, v1[..., 1] - v0[..., 1], 0.0)
        fail = jnp.sum(fail_cnt, axis=-1) > 0
        mean = jnp.sum(tv_sum, axis=-1)
        return g0 + (1e-12 * (mean[0] + fail[0])).astype(g0.dtype)

    results["prefix_gathers"] = timed("S3b span prefix gathers", s3b, g0_0, 8)

    # --- full path for reference ---------------------------------------------
    def sfull(p):
        s, t, a = fp_ops.check_polygonal_paths(
            state, p, quats_dev, n_poses, jnp.asarray(footprint), window, False
        )
        return p + 1e-9 * t[:, None, None] * jnp.ones((1, 1, 3))

    results["full"] = timed("FULL check_polygonal_paths", sfull, pos3, 4)

    log("---")
    total = results["full"]
    for k, v in results.items():
        log(f"{k:20s} {v*1e3:8.3f} ms  ({100*v/total:5.1f}% of full)")
    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == "__main__":
    main()
