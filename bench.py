"""Benchmark: batched footprint checks/sec on one TPU chip vs reference CPU.

Workload = BASELINE.json config 3: ~1k circular footprint paths x 50 poses
over a 10m x 10m rough-terrain map at 0.03 m resolution (full chain + dense
veto precompute, then batched spiral-parity circle checks).

Baseline = single-thread reference semantics on this host's CPU. A native C++
baseline (csrc/) is used when built; otherwise the NumPy/Python oracle's
steady-state per-check rate stands in (marked in the metric name).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "checks/s", "vs_baseline": N}

vs_baseline is computed against the PINNED baseline (BASELINE_pinned.json,
median-of-5 quiet-host measurement via scripts/pin_baseline.py) so the
multiplier does not move with host load; the live baseline is still measured
and printed as a sanity drift check (VERDICT r2 weak #2). Every run also
writes BENCH_last.json with per-kernel timings and compares them against the
committed previous run, flagging >25% regressions (VERDICT r2 weak #1).
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_pinned_baseline():
    try:
        with open(os.path.join(REPO, "BASELINE_pinned.json")) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def synthetic_terrain(rows, cols, resolution, seed=0):
    rng = np.random.default_rng(seed)
    x = np.arange(rows)[:, None] * resolution
    y = np.arange(cols)[None, :] * resolution
    # mostly-traversable rolling terrain with a hard step edge and holes —
    # planners query maps they can mostly drive on; an all-blocked map would
    # let every check fail at the first spiral cell (flattering both engines)
    z = (
        0.15 * np.sin(2.0 * x) * np.cos(1.5 * y)
        + 0.012 * rng.standard_normal((rows, cols))
        + 0.3 * ((x > x.mean()) & (y > y.mean()))
        + 0.05 * x
    )
    z[rng.random((rows, cols)) < 0.01] = np.nan
    return z.astype(np.float32)


def make_paths(rng, P, N, extent, step=0.06):
    starts = np.stack(
        [rng.uniform(-extent, extent, P), rng.uniform(-extent, extent, P)], axis=-1
    )
    steps = rng.uniform(-step, step, size=(P, N - 1, 2))
    poses = np.concatenate(
        [starts[:, None, :], starts[:, None, :] + np.cumsum(steps, axis=1)], axis=1
    ).astype(np.float32)
    return poses


def measure_baseline_checks_per_sec(layers, res, seed=7):
    """Single-thread reference-semantics circle checks on the host CPU.

    Prefers the native C++ baseline (csrc/reference_baseline.cpp, exact
    reference semantics, memo caches warm across the epoch — i.e. the
    strongest honest stand-in for the original C++ node); falls back to the
    Python oracle when not built."""
    rng = np.random.default_rng(seed)
    H, W = layers["elevation"].shape
    extent = min(H, W) * res / 2 * 0.8

    def centers(n):
        return np.stack(
            [rng.uniform(-extent, extent, n), rng.uniform(-extent, extent, n)],
            axis=-1,
        )

    try:
        from traversability_estimation_tpu.utils import native

        eng = native.BaselineQueryEngine(
            layers, res, critical_step_height=0.12, max_gap_width=0.3,
            default_traversability=0.5,
        )
        eng.check_circles(centers(2000), 0.45, 0.3)  # warm memo caches
        n = 50000
        cs = centers(n)
        t0 = time.perf_counter()
        eng.check_circles(cs, 0.45, 0.3)
        dt = time.perf_counter() - t0
        log("baseline engine: native C++ (single thread)")
        return n / dt
    except Exception as e:  # NativeUnavailable or load failure
        log(f"native baseline unavailable ({e}); using python oracle")
        from traversability_estimation_tpu.oracle.footprint import OracleMap

        om = OracleMap(
            layers, res, (0.0, 0.0), critical_step_height=0.12,
            max_gap_width=0.3, traversability_default=0.5, check_roughness=False,
        )
        cs = centers(60)
        for c in cs[:10]:
            om.is_traversable_circle(c, 0.45, 0.3)
        t0 = time.perf_counter()
        for c in cs[10:]:
            om.is_traversable_circle(c, 0.45, 0.3)
        return 50 / (time.perf_counter() - t0)


def main():
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from traversability_estimation_tpu.models import TraversabilityEstimator
    from traversability_estimation_tpu.utils.config import EstimatorConfig

    log("devices:", jax.devices())
    res = 0.03
    H = W = 336  # ~10m x 10m
    elev = synthetic_terrain(H, W, res, seed=1)

    est = TraversabilityEstimator(EstimatorConfig(resolution=res))
    t0 = time.perf_counter()
    est.update(elev)
    t_update_first = time.perf_counter() - t0
    log(f"first update (incl. compile): {t_update_first:.1f}s")

    # Measurement methodology: this host reaches the chip through a tunnel
    # with ~24 ms round-trip latency, and its client reports arrays "ready"
    # before device execution finishes — naive block_until_ready timing is
    # meaningless here. Each kernel therefore runs K data-chained iterations
    # inside ONE jitted lax.scan (each iteration consumes a scalar from the
    # previous one, so nothing can be elided or overlapped), and per-iter
    # time is the TWO-POINT SLOPE (t(K2) - t(K1)) / (K2 - K1), min of 3 reps:
    # the RTT cancels instead of being subtracted. (r01/r02 subtracted a
    # separately-probed RTT from a single wall time; with per-iter times of
    # 0.04-0.5 ms against a 25 ms RTT, a few ms of RTT tail jitter between
    # the probe and the measurement moved kernels 2-13x between rounds —
    # that was VERDICT r2 weak #1's "drift". The slope is immune.)
    import jax.numpy as jnp

    from traversability_estimation_tpu.ops import filters as chain_ops
    from traversability_estimation_tpu.ops import footprint as fp_ops
    from traversability_estimation_tpu.ops import veto as veto_ops

    # the RTT is still measured — reported for context, no longer subtracted
    _probe = jax.jit(lambda a: a + 1.0)
    _x = jnp.ones((8, 8))
    np.asarray(_probe(_x))  # compile
    _rtts = []
    for _ in range(5):
        _t = time.perf_counter()
        np.asarray(_probe(_x))
        _rtts.append(time.perf_counter() - _t)
    TUNNEL_RTT = statistics.median(_rtts)
    log(f"transport RTT: {TUNNEL_RTT*1e3:.1f} ms (context only; slope timing)")

    # Adaptive scan lengths: the slope is immune to the RTT's constant
    # part, but its JITTER (~±2 ms here) still rides on the t(K2)-t(K1)
    # difference. For sub-0.1 ms kernels at K2-K1=48 the difference is
    # ~3 ms — same order as the jitter, which is exactly how the r01/r02
    # dense-layer numbers "drifted" 0.19→0.52 ms between rounds.
    # Escalate K until the difference dominates the jitter (≥10 ms).
    from traversability_estimation_tpu.utils.profiling import adaptive_slope_stats

    # every kernel row carries {med, lo, hi, n} from paired repeats (same
    # convention as ABLATE/scaling rows since round 5) so a single-session
    # BENCH_last is distinguishable from its own jitter
    _spreads = {}

    def slope_time(make_loop, arg, k1, k2, reps=5, name=None):
        s = adaptive_slope_stats(
            make_loop, arg, k1, k2, 10e-3, reps, log=log
        )
        if name:
            _spreads[name] = {
                "med_ms": round(s["median_s"] * 1e3, 4),
                "lo_ms": round(s["lo_s"] * 1e3, 4),
                "hi_ms": round(s["hi_s"] * 1e3, 4),
                "n": s["n"],
            }
        return s["slope_s"]

    elev_dev = jnp.asarray(elev)
    ccfg, vcfg = est.config.chain, est.config.veto

    def make_update_loop(k):
        @jax.jit
        def loop(e):
            def body(carry, _):
                layers = chain_ops.run_chain(carry, ccfg)
                veto = veto_ops.compute_veto_fields(
                    {
                        "elevation": carry,
                        "traversability_slope": layers["traversability_slope"],
                        "traversability_step": layers["traversability_step"],
                    },
                    vcfg,
                )
                # consume EVERY output the production update writes,
                # ELEMENTWISE into the plane carry: a scalar [0, 0]
                # dependence lets XLA shrink stages to one cell's
                # neighborhood, and consuming only one layer lets it DCE
                # the other layers' finishing ops — both under-measure the
                # real update. Full REDUCTIONS per output are wrong in the
                # other direction (they break the mega-fusion: measured
                # +50%); the elementwise sum keeps all cells of all
                # outputs live at ~1% op overhead.
                acc = jnp.zeros_like(carry)
                for v in {**layers, **veto}.values():
                    acc = acc + (
                        jnp.nan_to_num(v)
                        if jnp.issubdtype(v.dtype, jnp.floating)
                        else v.astype(jnp.float32)
                    )
                return carry + 1e-12 * acc, None
            eK, _ = jax.lax.scan(body, e, None, length=k)
            return eK[0, 0]
        return loop

    t_update = slope_time(make_update_loop, elev_dev, 16, 64, name='update')
    log(f"map update true: {t_update*1e3:.2f} ms -> {H*W/t_update/1e6:.1f} Mcells/s")

    # --- speed-of-light accounting (utils/roofline.py): measured chip peaks
    # + analytic op/byte counts -> achieved % of the roofline bound
    from traversability_estimation_tpu.utils import roofline

    peaks = roofline.measure_peaks()
    vpu_flops = peaks["vpu_f32_flops_per_s"]
    bool_rate = peaks["bool_ops_per_s"]
    hbm_bw = peaks["hbm_bytes_per_s"]
    log(
        f"measured peaks: VPU f32 {vpu_flops/1e12:.2f} TFLOP/s "
        f"(= {peaks['vpu_f32_ops_per_s']/1e12:.2f} Tops/s issue rate), "
        f"bool/mask {bool_rate/1e12:.2f} Tops/s "
        f"({peaks['bool_to_f32_ratio']:.2f}x f32 issue rate), "
        f"HBM {hbm_bw/1e9:.0f} GB/s"
    )
    upd_counts = roofline.update_op_estimate(ccfg, vcfg)
    # two bounds, both reported (docs/DESIGN.md §6): the pure-op bound
    # prices shifted-plane reads at zero (the idealized stencil); the
    # shift-inclusive bound adds the MEASURED per-shift relayout cost
    # (ABLATE_last.json E1) — a hardware floor static shifts actually pay,
    # analogous to the circle field's dynamic-shift floor.
    # measured at 672^2 (4x the cells: the relayout term is ~4x the
    # subtraction noise there; a direct 336^2 reading clamped to 0) and
    # scaled per-cell — the relayout cost is per-element
    shift_cost = roofline.measure_static_shift_cost(
        (672, 672), vpu_f32_ops_per_s=peaks["vpu_f32_ops_per_s"]
    ) * (H * W) / (672 * 672)
    upd_sol_ops = roofline.sol_report(
        H * W, t_update, upd_counts, vpu_flops, hbm_bw, bool_rate
    )
    upd_sol = roofline.sol_report(
        H * W, t_update, upd_counts, vpu_flops, hbm_bw, bool_rate,
        shift_cost_s=shift_cost,
    )
    log(
        f"update SoL: {upd_counts['f32_ops_per_cell']:.0f} f32 + "
        f"{upd_counts['bool_ops_per_cell']:.0f} mask ops/cell + "
        f"{upd_counts['shifted_planes']:.0f} shifted planes "
        f"({shift_cost*1e6:.2f} us/shift measured), "
        f"{upd_counts['hbm_bytes_per_cell']:.0f} B/cell -> pure-op bound "
        f"{max(upd_sol_ops['t_compute_bound_s'], upd_sol_ops['t_memory_bound_s'])*1e3:.3f} ms, "
        f"shift-inclusive bound "
        f"{max(upd_sol['t_compute_bound_s'], upd_sol['t_memory_bound_s'])*1e3:.3f} ms "
        f"({upd_sol['binding']}-bound) -> achieved "
        f"{upd_sol_ops['pct_sol']:.0f}% of the pure-op stage-additive bound, "
        f"{upd_sol['pct_sol']:.0f}% incl. the measured relayout floor "
        f"(every output layer live; per-stage calibration via "
        f"scripts/calibrate_sol.py)"
    )

    # BASELINE config 2: dense traversability_footprint layer (the reference
    # footprint polygon scored at EVERY cell — TraversabilityMap.cpp:239-305)
    fp_cfg = np.asarray(est.config.footprint.footprint_polygon, np.float32)
    state0 = est.query_state

    def make_dense_loop(k):
        @jax.jit
        def loop(t):
            def body(carry, _):
                # plane carry: perturbation keeps iterations loop-dependent
                # AND consumes both outputs elementwise (all cells live, no
                # fusion-breaking reductions)
                st = fp_ops.QueryState(
                    traversability=state0.traversability + 0.0 * carry,
                    traversable_mask=state0.traversable_mask,
                    position=state0.position,
                    resolution=state0.resolution,
                    default_traversability=state0.default_traversability,
                )
                ok, tv = fp_ops.dense_polygon_field(st, fp_cfg)
                layer = jnp.where(ok, tv, 0.0)
                return carry + 1e-12 * jnp.nan_to_num(layer), None
            c, _ = jax.lax.scan(body, t, None, length=k)
            return c[0, 0]
        return loop

    t_dense = slope_time(make_dense_loop, jnp.zeros((H, W), jnp.float32), 8, 24, name='dense_footprint_layer')
    log(
        f"dense footprint layer (config 2): {t_dense*1e3:.2f} ms for {H*W:,} "
        f"cell-placements -> {H*W/t_dense/1e6:.1f} M placements/s"
    )

    rng = np.random.default_rng(3)
    P, N = 1024, 50
    extent = H * res / 2 * 0.8
    poses = make_paths(rng, P, N, extent)
    n_poses_np = np.full((P,), N, np.int32)

    radius = 0.3
    t0 = time.perf_counter()
    safe, trav = est.check_circular_paths_batch(poses, n_poses_np, radius)
    safe = np.asarray(safe)
    log(f"first path batch (incl. compile): {time.perf_counter()-t0:.1f}s")

    offset = est.config.footprint.circular_footprint_offset
    max_cells = est._max_segment_cells(poses, n_poses_np)
    state = est.query_state
    field = est._circle_field(float(radius), float(offset))
    poses_dev = jnp.asarray(poses)
    n_poses = jnp.asarray(n_poses_np)

    def make_query_loop(k):
        @jax.jit
        def loop(p):
            def body(carry, _):
                s, t = fp_ops.check_circular_paths(
                    state, carry, n_poses, radius, offset, max_cells, field, False
                )
                nxt = carry + 1e-9 * t[:, None, None]
                return nxt, t[0]
            pK, _ = jax.lax.scan(body, p, None, length=k)
            return pK[0, 0, 0]
        return loop

    # BASELINE config 3's polygonal variant: same 1024 paths x 50 poses swept
    # by the reference footprint rectangle (hulls of consecutive footprints).
    # Grouped evaluator: one fetched window per PATH, swept-hull emission
    # (identity quats + convex footprint), exact vs the per-segment oracle.
    footprint = np.asarray(est.config.footprint.footprint_polygon, np.float32)
    ext = poses.max(axis=1) - poses.min(axis=1)
    gwindow = fp_ops.path_group_window(
        footprint, ext, res, identity_orientation=True
    )
    pos3 = jnp.asarray(
        np.concatenate([poses, np.zeros((P, N, 1), np.float32)], -1)
    )
    quats = np.zeros((P, N, 4), np.float32)
    quats[..., 3] = 1.0
    quats_dev = jnp.asarray(quats)

    def make_poly_loop(k):
        @jax.jit
        def loop(p):
            def body(carry, _):
                s, t, a = fp_ops.check_polygonal_paths_grouped(
                    state, carry, quats_dev, n_poses, footprint, gwindow, False,
                    translate_only=True,
                )
                return carry + 1e-9 * t[:, None, None] * jnp.ones((1, 1, 3)), t[0]
            pK, _ = jax.lax.scan(body, p, None, length=k)
            return pK[0, 0, 0]
        return loop

    dt_poly = slope_time(make_poly_loop, pos3, 4, 12, name='poly_identity')
    log(
        f"polygonal batch true: {dt_poly*1e3:.2f} ms for {P} paths x {N} poses "
        f"(swept-hull rectangle) -> {P*N/dt_poly/1e6:.2f} M pose-checks/s"
    )

    # rotated-orientation polygonal batch — the reference's GENERAL case
    # (pose-rotated footprint vertices, TraversabilityMap.cpp:484-508):
    # random yaw per pose, hull build per segment, no translate_only
    # shortcut (VERDICT r2 weak #6: this path was parity-tested but never
    # measured).
    yaw = rng.uniform(0, 2 * np.pi, (P, N)).astype(np.float32)
    quats_rot = np.zeros((P, N, 4), np.float32)
    quats_rot[..., 2] = np.sin(yaw / 2)
    quats_rot[..., 3] = np.cos(yaw / 2)
    quats_rot_dev = jnp.asarray(quats_rot)
    # exact realized-yaw window — what the estimator dispatch uses for
    # rotated batches since round 5 (VERDICT r4 weak #2); strictly <= the
    # worst-case-rotation bound and verdict-identical (tested)
    gwindow_rot = fp_ops.path_group_window_exact(
        footprint, np.asarray(pos3), quats_rot, res
    )
    def make_poly_rot_loop(k):
        @jax.jit
        def loop(p):
            def body(carry, _):
                s, t, a = fp_ops.check_polygonal_paths_grouped(
                    state, carry, quats_rot_dev, n_poses, footprint, gwindow_rot,
                    False, translate_only=False,
                )
                return carry + 1e-9 * t[:, None, None] * jnp.ones((1, 1, 3)), t[0]
            pK, _ = jax.lax.scan(body, p, None, length=k)
            return pK[0, 0, 0]
        return loop

    dt_poly_rot = slope_time(make_poly_rot_loop, pos3, 4, 12, name='poly_rotated')
    log(
        f"polygonal batch rotated: {dt_poly_rot*1e3:.2f} ms for {P} paths x "
        f"{N} poses (random per-pose yaw, window {gwindow_rot}) -> "
        f"{P*N/dt_poly_rot/1e6:.2f} M pose-checks/s"
    )
    try:
        from traversability_estimation_tpu.utils import native

        lay = {
            k: np.asarray(v)
            for k, v in est.traversability_map.layers.items()
            if k in ("elevation", "traversability", "traversability_slope",
                     "traversability_step")
        }
        eng = native.BaselineQueryEngine(
            lay, res, critical_step_height=0.12, max_gap_width=0.3,
            default_traversability=0.5,
        )
        npb, nnb = 96, N
        eng.check_polygon_paths(poses[:8].astype(np.float64), footprint)  # warm
        t0 = time.perf_counter()
        eng.check_polygon_paths(poses[:npb].astype(np.float64), footprint)
        base_poly_live = npb * nnb / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001
        base_poly_live = None
        log(f"native polygonal baseline unavailable: {e}")
    pinned = load_pinned_baseline()
    base_poly = (
        pinned["polygonal_checks_per_s"] if pinned else base_poly_live
    )
    if base_poly:
        drift = (
            f" (live {base_poly_live:,.0f}, {base_poly_live/base_poly-1:+.0%} "
            f"vs pin)" if (pinned and base_poly_live) else " (live, unpinned)"
        )
        log(
            f"polygonal baseline (native C++ 1 thread, pinned): "
            f"{base_poly:,.0f} checks/s{drift} -> TPU speedup identity "
            f"{P*N/dt_poly/base_poly:,.0f}x, rotated "
            f"{P*N/dt_poly_rot/base_poly:,.0f}x"
        )

    dt = slope_time(make_query_loop, poses_dev, 8, 32, name='circular_batch')
    checks = P * N
    checks_per_sec = checks / dt
    log(
        f"path batch true: {dt*1e3:.2f} ms for {P} paths x {N} poses "
        f"-> {checks_per_sec:,.0f} pose-checks/s (safe {int(safe.sum())}/{P})"
    )

    # dense circle field (the per-update precompute behind circular batches)
    def make_field_loop(k):
        @jax.jit
        def loop(t):
            def body(carry, _):
                st = fp_ops.QueryState(
                    traversability=state0.traversability + 0.0 * carry,
                    traversable_mask=state0.traversable_mask,
                    position=state0.position,
                    resolution=state0.resolution,
                    default_traversability=state0.default_traversability,
                )
                okf, tvf = fp_ops.dense_circle_field(st, radius + offset, radius)
                # plane carry consumes both outputs elementwise (see
                # make_dense_loop)
                return carry + 1e-12 * jnp.nan_to_num(tvf) + 1e-13 * okf, None
            c, _ = jax.lax.scan(body, t, None, length=k)
            return c[0, 0]
        return loop

    t_field = slope_time(make_field_loop, jnp.zeros((H, W), jnp.float32), 8, 24, name='circle_field')
    fld_counts = roofline.circle_field_op_estimate(radius + offset, res)
    # the binding floor for the exact-spiral-order field is the per-offset
    # unaligned-shift relayout, not arithmetic (docs/DESIGN.md §7): measure
    # it on this chip and report pct_sol against it
    R_fld = int(math.ceil((radius + offset) / res))
    t_shift_floor = roofline.measure_shift_floor(
        (H, W), int(fld_counts["n_offsets"]), R_fld
    )
    fld_pct = 100.0 * t_shift_floor / max(t_field, 1e-12)
    fld_sol = {"pct_sol": fld_pct}
    log(
        f"dense circle field: {t_field*1e3:.2f} ms "
        f"({H*W/t_field/1e6:.0f} Mcells/s); shift-relayout floor "
        f"{t_shift_floor*1e3:.2f} ms -> {fld_pct:.0f}% of SoL "
        f"(arithmetic-only bound would be "
        f"{fld_counts['ops_per_cell'] * H * W / (vpu_flops / 2) * 1e3:.2f} ms; "
        f"the relayout, paid identically by XLA and Pallas, is the floor)"
    )

    layers = {
        k: np.asarray(v)
        for k, v in est.traversability_map.layers.items()
        if k
        in (
            "elevation",
            "traversability",
            "traversability_slope",
            "traversability_step",
            "traversability_roughness",
        )
    }
    baseline_live = measure_baseline_checks_per_sec(layers, res)
    baseline = pinned["circular_checks_per_s"] if pinned else baseline_live
    if pinned:
        log(
            f"baseline (native 1-thread, PINNED {time.strftime('%Y-%m-%d', time.gmtime(pinned['pinned_unix']))}): "
            f"{baseline:,.1f} checks/s; live re-measure {baseline_live:,.1f} "
            f"({baseline_live/baseline-1:+.0%} vs pin — load drift only, the "
            f"multiplier uses the pin)"
        )
    else:
        log(f"baseline (live, UNPINNED — run scripts/pin_baseline.py): "
            f"{baseline:,.1f} checks/s")

    # ---- per-kernel detail artifact + cross-round regression gate --------
    detail = {
        "schema": "BENCH_last v1",
        "t_update_ms": round(t_update * 1e3, 4),
        "t_dense_footprint_layer_ms": round(t_dense * 1e3, 4),
        "t_poly_identity_ms": round(dt_poly * 1e3, 4),
        "t_poly_rotated_ms": round(dt_poly_rot * 1e3, 4),
        "t_circular_batch_ms": round(dt * 1e3, 4),
        "t_circle_field_ms": round(t_field * 1e3, 4),
        "circular_checks_per_s": round(checks_per_sec, 1),
        "poly_identity_checks_per_s": round(P * N / dt_poly, 1),
        "poly_rotated_checks_per_s": round(P * N / dt_poly_rot, 1),
        "baseline_live_checks_per_s": round(baseline_live, 1),
        "baseline_pinned_checks_per_s": round(baseline, 1) if pinned else None,
        # primary = pure-op bound (harder, defensible: shifts amortize in
        # fused kernels, so the standalone relayout rate overshoots there —
        # CALIB stage rows with shift pricing exceeded 100%)
        "pct_sol_map_update": round(upd_sol_ops["pct_sol"], 1),
        "pct_sol_map_update_shift_incl": round(upd_sol["pct_sol"], 1),
        "shift_cost_us": round(shift_cost * 1e6, 3),
        "pct_sol_circle_field": round(fld_sol["pct_sol"], 1),
        "transport_rtt_ms": round(TUNNEL_RTT * 1e3, 2),
        "kernel_spreads": _spreads,
        # the SAME peaks block calibrate_sol embeds (roofline.measure_peaks)
        "peaks": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in peaks.items()
        },
    }
    last_path = os.path.join(REPO, "BENCH_last.json")
    regressions = []
    drift = []
    try:
        with open(last_path) as f:
            prev = json.load(f)
        for key in detail:
            if not key.startswith("t_"):
                continue
            old = prev.get(key)
            if not old:
                continue
            row = {"kernel": key, "prev_ms": old, "now_ms": detail[key],
                   "ratio": round(detail[key] / old, 2)}
            # two tiers: cross-session chip variance up to ~1.4x was measured
            # on unchanged binaries (docs/DESIGN.md §5), so 1.25-1.5x is a
            # WARNING (recorded, CI passes) and only >1.5x FAILS the gate
            if detail[key] > 1.5 * old:
                regressions.append(row)
            elif detail[key] > 1.25 * old:
                drift.append(row)
        if regressions:
            log(f"PERF REGRESSION vs committed BENCH_last.json: {regressions}")
        if drift:
            log(f"perf drift (within cross-session variance band): {drift}")
        if not regressions and not drift:
            log("no >25% per-kernel regressions vs committed BENCH_last.json")
    except (OSError, json.JSONDecodeError):
        log("no committed BENCH_last.json — first run records the floor")
    with open(last_path, "w") as f:
        json.dump(detail, f, indent=1)

    print(
        json.dumps(
            {
                "metric": "circular footprint pose-checks/s, 1 chip (baseline: PINNED single-thread native reference-semantics engine on host CPU)",
                "value": round(checks_per_sec, 1),
                "unit": "checks/s",
                "vs_baseline": round(checks_per_sec / baseline, 2),
                "vs_baseline_poly_identity": (
                    round(P * N / dt_poly / base_poly, 1) if base_poly else None
                ),
                "vs_baseline_poly_rotated": (
                    round(P * N / dt_poly_rot / base_poly, 1) if base_poly else None
                ),
                "pct_sol": {
                    "map_update": round(upd_sol_ops["pct_sol"], 1),
                    "map_update_shift_incl": round(upd_sol["pct_sol"], 1),
                    "dense_circle_field": round(fld_sol["pct_sol"], 1),
                },
                "regressions_vs_last": regressions,
                "drift_vs_last": drift,
            }
        )
    )


if __name__ == "__main__":
    main()
