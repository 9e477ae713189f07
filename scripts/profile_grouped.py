"""Stage decomposition of the GROUPED polygonal evaluator, identity vs
rotated (VERDICT r3 target: rotated >= 100x the pinned baseline).

Times, with the two-point scan-length slope:
  A. identity translate_only (the 185x fast path) — reference point
  B. rotated full (hull build + rotated window)     — the slow case
  C. rotated with the IDENTITY-SIZED window         — isolates window area
     (verdicts invalid for clipped paths; timing-only)
  D. rotated with translate_only=True               — skips convex_hull_batch
     (verdicts wrong; timing-only -> isolates the hull stage)
  E. convex_hull_batch alone on the 50k segment point sets

Run: python scripts/profile_grouped.py          (real chip)
     python scripts/profile_grouped.py --cpu    (plumbing smoke)
"""

from __future__ import annotations

import argparse
import json
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--paths", type=int, default=1024)
    ap.add_argument("--poses", type=int, default=50)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=12)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(_REPO, ".jax_cache_cpu" if args.cpu else ".jax_cache"),
    )
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
    est = TraversabilityEstimator(EstimatorConfig(resolution=res))
    est.update(synthetic_terrain(H, W, res, seed=1))
    state = est.query_state

    rng = np.random.default_rng(3)
    P, N = args.paths, args.poses
    poses = make_paths(rng, P, N, H * res / 2 * 0.8)
    footprint = np.asarray(est.config.footprint.footprint_polygon, np.float32)
    V = footprint.shape[0]
    ext = poses.max(axis=1) - poses.min(axis=1)
    win_id = fp_ops.path_group_window(footprint, ext, res, True)
    win_rot = fp_ops.path_group_window(footprint, ext, res, False)
    log(f"windows: identity {win_id}, rotated {win_rot} "
        f"(area x{win_rot[0]*win_rot[1]/(win_id[0]*win_id[1]):.2f})")

    pos3 = jnp.asarray(np.concatenate([poses, np.zeros((P, N, 1), np.float32)], -1))
    qid = np.zeros((P, N, 4), np.float32)
    qid[..., 3] = 1.0
    yaw = rng.uniform(0, 2 * np.pi, (P, N)).astype(np.float32)
    qrot = np.zeros((P, N, 4), np.float32)
    qrot[..., 2] = np.sin(yaw / 2)
    qrot[..., 3] = np.cos(yaw / 2)
    qid_dev, qrot_dev = jnp.asarray(qid), jnp.asarray(qrot)
    n_poses = jnp.asarray(np.full((P,), N, np.int32))

    def slope(make_loop, arg):
        f1, f2 = make_loop(args.k1), make_loop(args.k2)
        np.asarray(f1(arg))
        np.asarray(f2(arg))
        t1s, t2s = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f1(arg))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(f2(arg))
            t2s.append(time.perf_counter() - t0)
        return max(min(t2s) - min(t1s), 1e-9) / (args.k2 - args.k1)

    def grouped_loop(quats, window, translate_only):
        def make(k):
            @jax.jit
            def loop(p):
                def body(c, _):
                    s, t, a = fp_ops.check_polygonal_paths_grouped(
                        state, c, quats, n_poses, footprint, window,
                        False, translate_only,
                    )
                    return c + 1e-9 * t[:, None, None] * jnp.ones((1, 1, 3)), None
                c, _ = jax.lax.scan(body, p, None, length=k)
                return c[0, 0, 0]
            return loop
        return make

    rows = []

    def report(name, t):
        row = {"stage": name, "t_ms": round(t * 1e3, 3),
               "Mchecks_per_s": round(P * N / t / 1e6, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    report("A identity translate_only",
           slope(grouped_loop(qid_dev, win_id, True), pos3))
    report("B rotated full",
           slope(grouped_loop(qrot_dev, win_rot, False), pos3))
    report("C rotated, identity-size window (timing-only)",
           slope(grouped_loop(qrot_dev, win_id, False), pos3))
    report("D rotated, translate_only (skips hull; timing-only)",
           slope(grouped_loop(qrot_dev, win_rot, True), pos3))

    # round-5 (VERDICT r4 weak #2) — B2: exact realized-yaw window (valid
    # verdicts, production candidate); B3/B4: window-fetch materialization
    # variants at the exact window; A2/A3: the same fetch variants on the
    # identity fast path
    pos3_np = np.asarray(pos3)
    win_exact = fp_ops.path_group_window_exact(footprint, pos3_np, qrot, res)
    log(f"exact rotated window: {win_exact} "
        f"(area x{win_exact[0]*win_exact[1]/(win_rot[0]*win_rot[1]):.2f} of worst-case)")
    report("B2 rotated, exact window",
           slope(grouped_loop(qrot_dev, win_exact, False), pos3))
    for mode, tag in (("transpose", "B3"), ("rowgather", "B4")):
        fp_ops._WINDOW_FETCH_MODE = mode
        report(f"{tag} rotated, exact window, fetch={mode}",
               slope(grouped_loop(qrot_dev, win_exact, False), pos3))
    for mode, tag in (("transpose", "A2"), ("rowgather", "A3")):
        fp_ops._WINDOW_FETCH_MODE = mode
        report(f"{tag} identity translate_only, fetch={mode}",
               slope(grouped_loop(qid_dev, win_id, True), pos3))
    fp_ops._WINDOW_FETCH_MODE = "fused"

    # B5/B6 + A4: WINDOW BUCKETING (round 5) — the single static window
    # prices every path at the batch worst case; per-path requirements are
    # a random-walk distribution (2 buckets = ~0.74x total window area on
    # this batch, 3 = ~0.68x). Both buckets run inside ONE program.
    def bucketed_loop(quats_np, quats_dev, n_buckets, translate_only):
        plan = fp_ops.plan_window_buckets(
            footprint, np.concatenate(
                [poses, np.zeros((P, N, 1), np.float32)], -1
            ), quats_np, res, n_buckets,
        )
        log(f"bucket windows (n={n_buckets}, "
            f"{'id' if translate_only else 'rot'}): {plan[1]}")

        def make(k):
            @jax.jit
            def loop(p):
                def body(c, _):
                    s, t, a = fp_ops.check_polygonal_paths_bucketed(
                        state, c, quats_dev, n_poses, footprint, plan,
                        False, translate_only,
                    )
                    return c + 1e-9 * t[:, None, None] * jnp.ones((1, 1, 3)), None
                c, _ = jax.lax.scan(body, p, None, length=k)
                return c[0, 0, 0]
            return loop
        return make

    report("B5 rotated, 2 window buckets",
           slope(bucketed_loop(qrot, qrot_dev, 2, False), pos3))
    report("B6 rotated, 3 window buckets",
           slope(bucketed_loop(qrot, qrot_dev, 3, False), pos3))
    report("A4 identity translate_only, 2 window buckets",
           slope(bucketed_loop(qid, qid_dev, 2, True), pos3))

    # H: rotated with per-(path, segment-block) windows — the candidate fix:
    # block hulls span ~8 segments, so the span evaluator's window area (its
    # cost driver) shrinks ~3x; trades one window fetch per path for one per
    # (path, block).
    bw_rot = fp_ops.path_block_window(footprint, poses, res, False)
    log(f"block window rotated: {bw_rot} "
        f"(area x{bw_rot[0]*bw_rot[1]/(win_rot[0]*win_rot[1]):.2f} of path window)")

    def grouped_block_loop(quats, window, bw):
        def make(k):
            @jax.jit
            def loop(p):
                def body(c, _):
                    s, t, a = fp_ops.check_polygonal_paths_grouped(
                        state, c, quats, n_poses, footprint, window,
                        False, False, block_window=bw,
                    )
                    return c + 1e-9 * t[:, None, None] * jnp.ones((1, 1, 3)), None
                c, _ = jax.lax.scan(body, p, None, length=k)
                return c[0, 0, 0]
            return loop
        return make

    report("H rotated, block windows",
           slope(grouped_block_loop(qrot_dev, win_rot, bw_rot), pos3))
    bw_id = fp_ops.path_block_window(footprint, poses, res, True)
    report("I identity, block windows (translate_only off)",
           slope(grouped_block_loop(qid_dev, win_id, bw_id), pos3))

    # E: hull build alone
    polys0 = fp_ops.transform_footprint(jnp.asarray(footprint), pos3, qrot_dev)
    points = jnp.concatenate([polys0[:, :-1], polys0[:, 1:]], axis=2).reshape(
        P * (N - 1), 2 * V, 2
    )
    n_valid = jnp.full((P * (N - 1),), 2 * V, jnp.int32)

    def hull_loop(k):
        @jax.jit
        def loop(pts):
            def body(c, _):
                hulls, n_hull = convex_hull_batch(c, n_valid)
                return c + 1e-12 * hulls[0, 0, 0], None
            c, _ = jax.lax.scan(body, pts, None, length=k)
            return c[0, 0, 0]
        return loop

    t_h = slope(hull_loop, points)
    rows.append({"stage": f"E convex_hull_batch ({P*(N-1)} x {2*V} pts)",
                 "t_ms": round(t_h * 1e3, 3)})
    print(json.dumps(rows[-1]), flush=True)

    # F/G: window-fetch pattern costs (vmapped dynamic_slice from the padded
    # plane = XLA gather with per-path offsets). F is the one-time per-path
    # fetch the evaluator pays today; G is the per-(path, segment-block)
    # sub-window pattern a block-window variant would pay — its feasibility
    # probe.
    gwi, gwj = win_rot
    gpad = max(gwi, gwj)
    gpacked = jnp.pad(state.traversability, gpad, constant_values=jnp.inf)
    aidx = rng.integers(0, 300, size=(P, 2)).astype(np.int32)
    starts = jnp.asarray(aidx)

    def fetch_loop(wi, wj, nblocks):
        def make(k):
            @jax.jit
            def loop(s):
                def body(c, _):
                    def one(off):
                        return jax.vmap(
                            lambda si, sj: jax.lax.dynamic_slice(
                                gpacked, (si, sj), (wi, wj)
                            ),
                            out_axes=2,
                        )(c[:, 0] + off, c[:, 1] + off)
                    acc = 0.0
                    for b in range(nblocks):
                        w = one(jnp.int32(b))
                        acc = acc + jnp.nansum(w[0, 0])
                    return c + jnp.int32(1) * jnp.int32(acc == jnp.inf), None
                c, _ = jax.lax.scan(body, s, None, length=k)
                return c[0, 0]
            return loop
        return make

    t_f = slope(fetch_loop(gwi, gwj, 1), starts)
    rows.append({"stage": f"F per-path window fetch ({gwi}x{gwj}xP once)",
                 "t_ms": round(t_f * 1e3, 3),
                 "ns_per_elem": round(t_f / (gwi * gwj * P) * 1e9, 3)})
    print(json.dumps(rows[-1]), flush=True)

    bwi = bwj = 48
    t_g = slope(fetch_loop(bwi, bwj, 7), starts)
    rows.append({"stage": f"G per-block fetch (7 x {bwi}x{bwj}xP)",
                 "t_ms": round(t_g * 1e3, 3),
                 "ns_per_elem": round(t_g / (7 * bwi * bwj * P) * 1e9, 3)})
    print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
