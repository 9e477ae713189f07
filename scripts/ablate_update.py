"""Update-kernel SoL-gap ablation (VERDICT r3 task #1) — experiments, not
rhetoric.

Round 3 left the fused map update at ~50% of its stage-additive bound with an
untested hypothesis ("XLA's 10-output scheduling costs 2x"). This script runs
the decisive experiments on the attached chip:

E1  static-shift floor   what one `_shifted` (pad + static slice) actually
                         costs under XLA, by offset direction — the roofline
                         model prices shifted reads at ZERO, and the step
                         stage's 10% reading says that assumption is wrong
                         somewhere.
E2  stage isolation      per-stage slope times with ELEMENTWISE plane-carry
                         consumption (round 3 used a fusion-breaking nansum).
E3  step variants        production step_layer vs (a) packed-sentinel shifts
                         (validity derived from the +/-3e38 encodings:
                         25 plane shifts -> 15) vs (b) separable
                         reduce_window cross-max/min/count (exact: the cross
                         window is the union of a 1x3 and a 3x1 window).
E4  normals variants     production vs packed-sentinel (one shift per offset
                         instead of two).
E5  output-count ablation  fused update consuming 1/3/5/7/all output planes —
                         if time is ~linear in live outputs past a knee, the
                         graph is scheduling-bound, not arithmetic-bound.
E6  split vs barriers    one fused graph vs optimization_barrier between
                         chain and veto vs barrier after every stage vs two
                         separate compiled programs with HBM materialization.
E7  walk variants        round-3 bool-plane walk vs the packed int32
                         bit-pack rewrite (verdict: bit-pack 1.5x SLOWER;
                         the production code reverted to bool planes).
E8  count-veto variants  direct 29-shift disc vs row-span box sums
                         (verdict: box sums 3.6x faster, exact — promoted).
E10 pallas tile sweep    the fused Pallas chain at (128,128)/(192,256)/
                         (256,256) tiles vs the XLA path (via
                         chip_session.py pallas_tiles; verdict: best tile
                         still 2.5x slower — XLA stays production).
E11 walk combine         per-(offset, direction) bool shifts vs sector-
                         grouped OR planes (verdict: sectors 14% faster,
                         exact — promoted). NOTE since round 5 the
                         "production" variant here is the sentinel-folded
                         walk (E12), so E11 doubles as a v1-sector vs v2
                         cross-check.
E12 walk formulation     round-4 bool-plane walk (v1, kept as
                         step_veto_ok_v1) vs the round-5 sentinel fold
                         (~104 shifted planes vs ~236; verdict: 1.45x
                         faster, cell-exact — promoted to production).

Timing: two-point chained-scan slope everywhere (docs/DESIGN.md §5).
Output: one JSON line per experiment row; run via scripts/chip_session.py
(job name: ablate) so the artifact lands in ABLATE_last.json.

Usage: python scripts/ablate_update.py [--size 336] [--cpu]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.append(_REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=336)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip", nargs="*", default=[],
                    help="experiment ids to skip, e.g. E1 E6")
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

    from traversability_estimation_tpu.grid.geometry import circle_offsets
    from traversability_estimation_tpu.ops import filters as F
    from traversability_estimation_tpu.ops import veto as V
    from traversability_estimation_tpu.ops.filters import _shifted
    from traversability_estimation_tpu.utils import roofline
    from traversability_estimation_tpu.utils.profiling import adaptive_slope_stats

    log(f"devices: {jax.devices()}")
    res = 0.03
    H = W = args.size
    cells = H * W
    ccfg = F.ChainConfig(resolution=res)
    vcfg = V.VetoConfig(resolution=res, check_roughness=False)

    rng = np.random.default_rng(1)
    elev_np = (0.1 * rng.standard_normal((H, W))).astype(np.float32)
    elev_np[rng.random((H, W)) < 0.01] = np.nan
    elev = jnp.asarray(elev_np)

    floor_ms = 2e-3 if args.cpu else 6e-3

    # VERDICT r4 weak #5: every E-row carries {med_ms, lo_ms, hi_ms, n} from
    # n>=5 PAIRED repeats of the slope (see adaptive_slope_stats) so a
    # conclusion and the rig's jitter are separable. The spread describes
    # the row's own (last) slope measurement; derived deltas (e.g. E1's
    # per-shift cost, a difference of two slopes) compose two such spreads.
    _last_stats: dict = {}

    def slope(make_loop, arg, k1=16, k2=48):
        s = adaptive_slope_stats(
            make_loop, arg, k1, k2, floor_ms, reps=5, log=log
        )
        _last_stats.clear()
        _last_stats.update(s)
        return s["slope_s"]

    def emit(row):
        if _last_stats and any(str(k).endswith("_ms") for k in row):
            row = {
                **row,
                "med_ms": round(_last_stats["median_s"] * 1e3, 4),
                "lo_ms": round(_last_stats["lo_s"] * 1e3, 4),
                "hi_ms": round(_last_stats["hi_s"] * 1e3, 4),
                "n": _last_stats["n"],
            }
            _last_stats.clear()
        print(json.dumps(row), flush=True)

    def plane_loop(fn):
        """Standard harness: chained scan, elementwise plane-carry
        consumption of every output fn returns (dict or array)."""

        def make(k):
            @jax.jit
            def loop(e):
                def body(c, _):
                    out = fn(c)
                    if isinstance(out, dict):
                        vals = out.values()
                    elif isinstance(out, (tuple, list)):
                        vals = out
                    else:
                        vals = [out]
                    acc = jnp.zeros_like(c)
                    for v in vals:
                        acc = acc + (
                            jnp.nan_to_num(v)
                            if jnp.issubdtype(v.dtype, jnp.floating)
                            else v.astype(jnp.float32)
                        )
                    return c + 1e-12 * acc, None

                c, _ = jax.lax.scan(body, e, None, length=k)
                return c[0, 0]

            return loop

        return make

    peaks = roofline.measure_peaks()
    emit({"exp": "peaks", "size": args.size, **{
        k: (round(v, 4) if isinstance(v, float) else v) for k, v in peaks.items()
    }})
    vpu_ops = peaks["vpu_f32_ops_per_s"]
    bool_rate = peaks["bool_ops_per_s"]

    # ------------------------------------------------------------------ E1
    # Static-shift floor: N accumulating shifted reads of one plane vs the
    # same loop with zero offsets (pure adds). The difference / N is what a
    # static shift costs in an N-operand fusion.
    if "E1" not in args.skip:
        def shift_acc_loop(offsets):
            offs = list(offsets)

            def fn(c):
                acc = jnp.zeros_like(c)
                for di, dj in offs:
                    acc = acc + _shifted(c, di, dj, 0.0)
                return acc

            return plane_loop(fn)

        n = 16
        sets = {
            "none": [(0, 0)] * n,
            "rows": [((i % 9) - 4 or 1, 0) for i in range(n)],
            "cols": [(0, (i % 9) - 4 or 1) for i in range(n)],
            "diag": [((i % 7) - 3 or 1, (i % 5) - 2 or 1) for i in range(n)],
        }
        base_t = None
        for name, offs in sets.items():
            t = slope(shift_acc_loop(offs), elev)
            if name == "none":
                base_t = t
            per_shift_us = (t - (base_t or 0.0)) / n * 1e6
            emit({
                "exp": "E1_shift_floor", "size": args.size, "set": name,
                "n_shifts": n, "t_ms": round(t * 1e3, 4),
                "per_shift_us_vs_none": round(per_shift_us, 3),
                "add_bound_ms": round(n * cells / vpu_ops * 1e3, 4),
            })

    # ------------------------------------------------------------------ E2
    # Stage isolation with elementwise consumption.
    normals = F.surface_normals(elev, res, ccfg.normals_radius)
    nz = normals["surface_normal_z"]
    slope_l = F.slope_from_normals(nz, ccfg.slope_critical_value)
    step_l = F.step_layer(
        elev, res, ccfg.step_critical_value, ccfg.step_first_window_radius,
        ccfg.step_second_window_radius, ccfg.step_critical_cell_number,
    )
    jax.block_until_ready((slope_l, step_l))

    model = roofline.update_op_estimate(ccfg, vcfg)["breakdown"]

    def stage_bound_ms(name):
        m = model.get(name, {"f32": 0, "bool": 0})
        return cells * (m["f32"] / vpu_ops + m["bool"] / bool_rate) * 1e3

    stages = {
        "normals": lambda c: F.surface_normals(c, res, ccfg.normals_radius),
        "step": lambda c: F.step_layer(
            c, res, ccfg.step_critical_value, ccfg.step_first_window_radius,
            ccfg.step_second_window_radius, ccfg.step_critical_cell_number,
        ),
        "veto_counts": lambda c: V._count_veto_ok(
            slope_l + 0.0 * c[0, 0], res, vcfg.slope_n_critical
        ).astype(jnp.float32),
        "veto_step_walk": lambda c: V.step_veto_ok(
            c, step_l + 0.0 * c[0, 0], vcfg
        ).astype(jnp.float32),
    }
    if "E2" not in args.skip:
        for name, fn in stages.items():
            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E2_stage_elementwise", "size": args.size, "stage": name,
                "t_ms": round(t * 1e3, 4),
                "bound_ms": round(stage_bound_ms(name), 4),
                "pct_sol": round(100 * stage_bound_ms(name) / (t * 1e3), 1),
            })

    # ------------------------------------------------------------------ E3
    # step_layer variants (numerics-identical by construction; the promoted
    # winner is additionally gated by the golden bit-exact test).
    _NEG = float(np.float32(-3.0e38))
    _POS = float(np.float32(3.0e38))

    def step_packed(elevation):
        """Validity derived from the sentinel encodings: pass 1 shifts 2
        planes per offset (max/min encodings), pass 2 shifts 1."""
        el = elevation.astype(jnp.float32)
        valid = jnp.isfinite(el)
        zmax_in = jnp.where(valid, el, _NEG)
        zmin_in = jnp.where(valid, el, _POS)
        hmax = jnp.full_like(el, _NEG)
        hmin = jnp.full_like(el, _POS)
        for di, dj in circle_offsets(
            ccfg.step_first_window_radius, res
        ).tolist():
            hmax = jnp.maximum(hmax, _shifted(zmax_in, di, dj, _NEG))
            hmin = jnp.minimum(hmin, _shifted(zmin_in, di, dj, _POS))
        any1 = hmax > 0.5 * _NEG  # some valid neighbor iff hmax left the sentinel
        step_height = jnp.where(valid & any1, hmax - hmin, jnp.nan)

        sh_max_in = jnp.where(jnp.isfinite(step_height), step_height, _NEG)
        smax_raw = jnp.full_like(el, _NEG)
        ncrit = jnp.zeros_like(el)
        for di, dj in circle_offsets(
            ccfg.step_second_window_radius, res
        ).tolist():
            shn = _shifted(sh_max_in, di, dj, _NEG)
            smax_raw = jnp.maximum(smax_raw, shn)
            ncrit = ncrit + jnp.where(shn > ccfg.step_critical_value, 1.0, 0.0)
        any2 = smax_raw > 0.5 * _NEG
        smax = jnp.maximum(smax_raw, 0.0)
        step = jnp.minimum(
            smax, ncrit / float(ccfg.step_critical_cell_number) * smax
        )
        out = jnp.where(
            step < ccfg.step_critical_value,
            1.0 - step / ccfg.step_critical_value, 0.0,
        )
        return jnp.where(any2, out, jnp.nan).astype(jnp.float32)

    def _cross_max(x):
        """Max over the 5-cell cross = max of a 1x3 and a 3x1 window —
        exact and separable (reduce_window)."""
        r = jax.lax.reduce_window(
            x, _NEG, jax.lax.max, (1, 3), (1, 1), "SAME"
        )
        c = jax.lax.reduce_window(
            x, _NEG, jax.lax.max, (3, 1), (1, 1), "SAME"
        )
        return jnp.maximum(r, c)

    def _cross_min(x):
        r = jax.lax.reduce_window(x, _POS, jax.lax.min, (1, 3), (1, 1), "SAME")
        c = jax.lax.reduce_window(x, _POS, jax.lax.min, (3, 1), (1, 1), "SAME")
        return jnp.minimum(r, c)

    def _cross_sum(x):
        r = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3), (1, 1), "SAME")
        c = jax.lax.reduce_window(x, 0.0, jax.lax.add, (3, 1), (1, 1), "SAME")
        return r + c - x

    def step_rw(elevation):
        el = elevation.astype(jnp.float32)
        valid = jnp.isfinite(el)
        zmax_in = jnp.where(valid, el, _NEG)
        zmin_in = jnp.where(valid, el, _POS)
        hmax = _cross_max(zmax_in)
        hmin = _cross_min(zmin_in)
        any1 = hmax > 0.5 * _NEG
        step_height = jnp.where(valid & any1, hmax - hmin, jnp.nan)
        sh_max_in = jnp.where(jnp.isfinite(step_height), step_height, _NEG)
        smax_raw = _cross_max(sh_max_in)
        ncrit = _cross_sum(
            jnp.where(sh_max_in > ccfg.step_critical_value, 1.0, 0.0)
        )
        any2 = smax_raw > 0.5 * _NEG
        smax = jnp.maximum(smax_raw, 0.0)
        step = jnp.minimum(
            smax, ncrit / float(ccfg.step_critical_cell_number) * smax
        )
        out = jnp.where(
            step < ccfg.step_critical_value,
            1.0 - step / ccfg.step_critical_value, 0.0,
        )
        return jnp.where(any2, out, jnp.nan).astype(jnp.float32)

    step_variants = {
        "production": lambda c: F.step_layer(
            c, res, ccfg.step_critical_value, ccfg.step_first_window_radius,
            ccfg.step_second_window_radius, ccfg.step_critical_cell_number,
        ),
        "packed_sentinel": step_packed,
        "reduce_window": step_rw,
    }
    if "E3" not in args.skip:
        ref = np.asarray(step_variants["production"](elev))
        for name, fn in step_variants.items():
            got = np.asarray(fn(elev))
            exact = np.array_equal(got, ref, equal_nan=True)
            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E3_step_variant", "size": args.size, "variant": name,
                "t_ms": round(t * 1e3, 4), "bitexact_vs_production": bool(exact),
                "bound_ms": round(stage_bound_ms("step"), 4),
                "pct_sol": round(100 * stage_bound_ms("step") / (t * 1e3), 1),
            })

    # ------------------------------------------------------------------ E4
    # normals variants: packed-sentinel (1 shift per offset instead of 2).
    def normals_packed(elevation):
        el = elevation.astype(jnp.float32)
        valid = jnp.isfinite(el)
        zf = jnp.where(valid, el, 0.0)
        ze = jnp.where(valid, el, _NEG)
        offs = circle_offsets(ccfg.normals_radius, res)
        n = jnp.zeros_like(zf)
        sx = jnp.zeros_like(zf)
        sy = jnp.zeros_like(zf)
        sz = jnp.zeros_like(zf)
        sxx = jnp.zeros_like(zf)
        sxy = jnp.zeros_like(zf)
        sxz = jnp.zeros_like(zf)
        syy = jnp.zeros_like(zf)
        syz = jnp.zeros_like(zf)
        szz = jnp.zeros_like(zf)
        for di, dj in offs.tolist():
            dx = jnp.float32(-di * res)
            dy = jnp.float32(-dj * res)
            zs = _shifted(ze, di, dj, _NEG)
            v = (zs > 0.5 * _NEG).astype(jnp.float32)
            z = jnp.where(zs > 0.5 * _NEG, zs, 0.0) - zf * v
            n = n + v
            sx = sx + v * dx
            sy = sy + v * dy
            sz = sz + z
            sxx = sxx + v * dx * dx
            sxy = sxy + v * dx * dy
            sxz = sxz + z * dx
            syy = syy + v * dy * dy
            syz = syz + z * dy
            szz = szz + z * z
        ns = jnp.maximum(n, 1.0)
        mx, my, mz = sx / ns, sy / ns, sz / ns
        vx, vy, vz, _, eig_mid = F.smallest_eigvec_planes(
            sxx / ns - mx * mx, sxy / ns - mx * my, sxz / ns - mx * mz,
            syy / ns - my * my, syz / ns - my * mz, szz / ns - mz * mz,
        )
        degenerate = eig_mid <= 1e-8
        vx = jnp.where(degenerate, 0.0, vx)
        vy = jnp.where(degenerate, 0.0, vy)
        vz = jnp.where(degenerate, 1.0, vz)
        flip = vz < 0.0
        vx = jnp.where(flip, -vx, vx)
        vy = jnp.where(flip, -vy, vy)
        vz = jnp.where(flip, -vz, vz)
        nan = jnp.float32(jnp.nan)
        return {
            "surface_normal_x": jnp.where(valid, vx, nan),
            "surface_normal_y": jnp.where(valid, vy, nan),
            "surface_normal_z": jnp.where(valid, vz, nan),
        }

    if "E4" not in args.skip:
        refn = {k: np.asarray(v) for k, v in normals.items()}
        gotn = {k: np.asarray(v) for k, v in normals_packed(elev).items()}
        exact = all(
            np.array_equal(gotn[k], refn[k], equal_nan=True) for k in refn
        )
        for name, fn in {
            "production": lambda c: F.surface_normals(c, res, ccfg.normals_radius),
            "packed_sentinel": normals_packed,
        }.items():
            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E4_normals_variant", "size": args.size, "variant": name,
                "t_ms": round(t * 1e3, 4),
                "bitexact_vs_production": bool(exact) if name != "production" else True,
                "bound_ms": round(stage_bound_ms("normals"), 4),
                "pct_sol": round(100 * stage_bound_ms("normals") / (t * 1e3), 1),
            })

    # ------------------------------------------------------------------ E5
    # Output-count ablation of the FUSED update.
    def fused_outputs(c):
        layers = F.run_chain(c, ccfg)
        veto = V.compute_veto_fields(
            {
                "elevation": c,
                "traversability_slope": layers["traversability_slope"],
                "traversability_step": layers["traversability_step"],
            },
            vcfg,
        )
        return {**layers, **veto}

    if "E5" not in args.skip:
        all_keys = list(fused_outputs(elev).keys())
        log(f"fused update output planes: {all_keys}")
        for n_live in (1, 3, 5, 7, len(all_keys)):
            keys = all_keys[:n_live]

            def fn(c, keys=tuple(keys)):
                out = fused_outputs(c)
                return {k: out[k] for k in keys}

            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E5_outputs", "size": args.size, "n_live": n_live,
                "live": keys, "t_ms": round(t * 1e3, 4),
            })

    # ------------------------------------------------------------------ E11
    # walk candidate-combine variants: the per-(offset, allowed-direction)
    # bool-plane OR costs ~84 shifted reads; the allowed-direction sets take
    # only ~9 distinct values over the candidate disc, so pre-ORing one
    # plane per SECTOR and shifting that (21 f32 shifts, conversions hoisted)
    # does the same work. (The int32 bit-pack attempt at the same reduction
    # lost 1.5x — E7; this stays in the bool/f32 domain XLA fuses well.)
    if "E11" not in args.skip:
        import math as _m

        def walk_sector(elevation, step_l_in):
            el = elevation.astype(jnp.float32)
            step0 = step_l_in == 0.0
            crit = jnp.float32(vcfg.critical_step_height)
            in_map = jnp.ones(el.shape, dtype=bool)
            dirs = V._ray_directions(vcfg)
            ray_fail = []
            for di, dj, K in dirs:
                h = el
                nb_elev = _shifted(el, di, dj, jnp.nan)
                nb_in = _shifted(in_map, di, dj, False)
                nb_step0 = _shifted(step0, di, dj, False)
                trigger = nb_in & nb_step0 & (nb_elev < h - crit)
                gap_started = jnp.zeros(el.shape, dtype=bool)
                ended = jnp.zeros(el.shape, dtype=bool)
                wall_fail = jnp.zeros(el.shape, dtype=bool)
                any_gap = jnp.zeros(el.shape, dtype=bool)
                for t in range(1, K + 1):
                    e_t = _shifted(el, di * t, dj * t, jnp.nan)
                    t_in = _shifted(in_map, di * t, dj * t, False)
                    active = t_in
                    wall_t = active & (e_t > h + crit)
                    gap_t = active & ((e_t < h - crit) | ~jnp.isfinite(e_t))
                    mid_t = active & ~wall_t & ~gap_t
                    end_t = mid_t & gap_started & ~ended
                    wall_fail = wall_fail | (wall_t & ~ended)
                    any_gap = any_gap | (gap_t & ~ended)
                    gap_started = gap_started | gap_t
                    ended = ended | end_t
                unclosed = any_gap & ~ended
                ray_fail.append(trigger & (wall_fail | unclosed))

            # group candidate offsets by their allowed-direction set; OR the
            # member ray_fail planes ONCE per distinct set, convert to f32
            # once, and shift the combined plane per offset
            cand_offs = circle_offsets(2.5 * res, res).tolist()
            sets = {}
            for o in cand_offs:
                oi, oj = int(o[0]), int(o[1])
                small = _m.hypot(oi, oj) * res <= 0.025
                allowed = tuple(
                    d_idx for d_idx, (di, dj, _) in enumerate(dirs)
                    if small or (oi * di + oj * dj) <= 0
                )
                sets.setdefault(allowed, []).append((oi, oj))
            sector_f32 = {}
            for allowed in sets:
                acc = jnp.zeros(el.shape, dtype=bool)
                for d_idx in allowed:
                    acc = acc | ray_fail[d_idx]
                sector_f32[allowed] = acc.astype(jnp.float32)

            has_cand = jnp.zeros(el.shape, dtype=bool)
            fail_from_cand = jnp.zeros(el.shape, dtype=bool)
            for allowed, offs in sets.items():
                plane = sector_f32[allowed]
                for oi, oj in offs:
                    c_elev = _shifted(el, oi, oj, jnp.nan)
                    c_in = _shifted(in_map, oi, oj, False)
                    c_step0 = _shifted(step0, oi, oj, False)
                    active = c_in & c_step0 & (c_elev > el + crit)
                    has_cand = has_cand | active
                    fail_from_cand = fail_from_cand | (
                        active & (_shifted(plane, oi, oj, 0.0) > 0.5)
                    )
            fail_self = jnp.zeros(el.shape, dtype=bool)
            for rf in ray_fail:
                fail_self = fail_self | rf
            fail = step0 & (
                (has_cand & fail_from_cand) | (~has_cand & fail_self)
            )
            return ~fail

        ref_w2 = np.asarray(V.step_veto_ok(elev, step_l, vcfg))
        got_w2 = np.asarray(walk_sector(elev, step_l))
        for name, fn in {
            "production": lambda c: V.step_veto_ok(
                c, step_l + 0.0 * c[0, 0], vcfg
            ).astype(jnp.float32),
            "sector_or": lambda c: walk_sector(
                c, step_l + 0.0 * c[0, 0]
            ).astype(jnp.float32),
        }.items():
            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E11_walk_combine", "size": args.size, "variant": name,
                "t_ms": round(t * 1e3, 4),
                "agree": bool(np.array_equal(got_w2, ref_w2)),
            })

    # ------------------------------------------------------------------ E12
    # Walk formulations (VERDICT r4 task #1): round-4 bool-plane production
    # (v1: separate shifted elev/in_map/step0 planes, ~236 shifted reads)
    # vs the round-5 sentinel fold (one NaN-sentinel selev plane for
    # trigger+candidate tests with the 8 trigger offsets CSE-shared into
    # the candidate disc, one -inf/NaN-coded welev plane per walk step,
    # analytic borders: ~104 shifted reads). Both cell-exact (asserted).
    if "E12" not in args.skip:
        ref12 = np.asarray(V.step_veto_ok_v1(elev, step_l, vcfg))
        got12 = np.asarray(V.step_veto_ok(elev, step_l, vcfg))
        agree12 = bool(np.array_equal(ref12, got12))
        for name, fn in {
            "v1_bool_planes": lambda c: V.step_veto_ok_v1(
                c, step_l + 0.0 * c[0, 0], vcfg
            ).astype(jnp.float32),
            "v2_sentinel_fold": lambda c: V.step_veto_ok(
                c, step_l + 0.0 * c[0, 0], vcfg
            ).astype(jnp.float32),
        }.items():
            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E12_walk_formulation", "size": args.size,
                "variant": name, "t_ms": round(t * 1e3, 4),
                "agree": agree12,
            })

    # ------------------------------------------------------------------ E8
    # count-veto variants: direct 29-shift disc accumulation vs a row-
    # decomposed box-sum form (box sums per distinct row width, then
    # vertical combine: ~16 shifts, mostly the cheap row direction). Counts
    # are small integers in f32 -> any summation order is exact.
    if "E8" not in args.skip:
        def count_box(layer):
            is_zero = layer == 0.0
            zf = is_zero.astype(jnp.float32)
            # disc radius 3 cells: row widths by |di|: 0->7, 1..2->5, 3->1
            def rowsum(x, half):
                acc = x
                for dj in range(1, half + 1):
                    acc = acc + _shifted(x, 0, dj, 0.0) + _shifted(
                        x, 0, -dj, 0.0
                    )
                return acc

            r7 = rowsum(zf, 3)
            r5 = rowsum(zf, 2)
            count = r7
            for di in (1, 2):
                count = count + _shifted(r5, di, 0, 0.0) + _shifted(
                    r5, -di, 0, 0.0
                )
            count = count + _shifted(zf, 3, 0, 0.0) + _shifted(
                zf, -3, 0, 0.0
            )
            fail = is_zero & (count > jnp.float32(vcfg.slope_n_critical))
            return (~fail).astype(jnp.float32)

        ref_c = np.asarray(
            V._count_veto_ok(slope_l, res, vcfg.slope_n_critical)
        )
        got_c = np.asarray(count_box(slope_l) > 0.5)
        for name, fn in {
            "production": lambda c: V._count_veto_ok(
                slope_l + 0.0 * c[0, 0], res, vcfg.slope_n_critical
            ).astype(jnp.float32),
            "box_sum": lambda c: count_box(slope_l + 0.0 * c[0, 0]),
        }.items():
            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E8_count_variant", "size": args.size, "variant": name,
                "t_ms": round(t * 1e3, 4),
                "agree": bool(np.array_equal(got_c, ref_c)),
            })

    # ------------------------------------------------------------------ E7
    # walk variants: round-3 implementation (separate bool-plane shifts) vs
    # the packed/bit-packed production rewrite — clean A/B on one chip.
    if "E7" not in args.skip:
        def walk_old(elevation, step_l_in):
            el = elevation.astype(jnp.float32)
            step0 = step_l_in == 0.0
            crit = jnp.float32(vcfg.critical_step_height)
            in_map = jnp.ones(el.shape, dtype=bool)
            dirs = V._ray_directions(vcfg)
            ray_fail = []
            for di, dj, K in dirs:
                h = el
                nb_elev = _shifted(el, di, dj, jnp.nan)
                nb_in = _shifted(in_map, di, dj, False)
                nb_step0 = _shifted(step0, di, dj, False)
                trigger = nb_in & nb_step0 & (nb_elev < h - crit)
                gap_started = jnp.zeros(el.shape, dtype=bool)
                ended = jnp.zeros(el.shape, dtype=bool)
                wall_fail = jnp.zeros(el.shape, dtype=bool)
                any_gap = jnp.zeros(el.shape, dtype=bool)
                for t in range(1, K + 1):
                    e_t = _shifted(el, di * t, dj * t, jnp.nan)
                    t_in = _shifted(in_map, di * t, dj * t, False)
                    active = t_in
                    wall_t = active & (e_t > h + crit)
                    gap_t = active & (
                        (e_t < h - crit) | ~jnp.isfinite(e_t)
                    )
                    mid_t = active & ~wall_t & ~gap_t
                    end_t = mid_t & gap_started & ~ended
                    wall_fail = wall_fail | (wall_t & ~ended)
                    any_gap = any_gap | (gap_t & ~ended)
                    gap_started = gap_started | gap_t
                    ended = ended | end_t
                unclosed = any_gap & ~ended
                ray_fail.append(trigger & (wall_fail | unclosed))
            ray_fail_any = jnp.stack(ray_fail, axis=0)
            cand_offs = circle_offsets(2.5 * res, res)
            has_cand = jnp.zeros(el.shape, dtype=bool)
            fail_from_cand = jnp.zeros(el.shape, dtype=bool)
            import math as _m

            for o in cand_offs.tolist():
                oi, oj = int(o[0]), int(o[1])
                c_elev = _shifted(el, oi, oj, jnp.nan)
                c_in = _shifted(in_map, oi, oj, False)
                c_step0 = _shifted(step0, oi, oj, False)
                active = c_in & c_step0 & (c_elev > el + crit)
                has_cand = has_cand | active
                small = _m.hypot(oi, oj) * res <= 0.025
                fail_d = jnp.zeros(el.shape, dtype=bool)
                for d_idx, (di, dj, _) in enumerate(dirs):
                    if not small and (oi * di + oj * dj) > 0:
                        continue
                    fail_d = fail_d | _shifted(
                        ray_fail_any[d_idx], oi, oj, False
                    )
                fail_from_cand = fail_from_cand | (active & fail_d)
            fail_self = jnp.zeros(el.shape, dtype=bool)
            for d_idx in range(len(dirs)):
                fail_self = fail_self | ray_fail_any[d_idx]
            fail = step0 & (
                (has_cand & fail_from_cand) | (~has_cand & fail_self)
            )
            return ~fail

        wv = {
            "production": lambda c: V.step_veto_ok(
                c, step_l + 0.0 * c[0, 0], vcfg
            ).astype(jnp.float32),
            "round3": lambda c: walk_old(
                c, step_l + 0.0 * c[0, 0]
            ).astype(jnp.float32),
        }
        ref_w = np.asarray(V.step_veto_ok(elev, step_l, vcfg))
        got_w = np.asarray(walk_old(elev, step_l))
        for name, fn in wv.items():
            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E7_walk_variant", "size": args.size, "variant": name,
                "t_ms": round(t * 1e3, 4),
                "agree": bool(np.array_equal(got_w, ref_w)),
            })

    # ------------------------------------------------------------------ E6
    # Fused vs optimization_barrier placements vs two separate programs.
    if "E6" not in args.skip:
        def fused_all(c):
            return fused_outputs(c)

        def barrier_chain_veto(c):
            layers = F.run_chain(c, ccfg)
            layers = jax.lax.optimization_barrier(layers)
            veto = V.compute_veto_fields(
                {
                    "elevation": c,
                    "traversability_slope": layers["traversability_slope"],
                    "traversability_step": layers["traversability_step"],
                },
                vcfg,
            )
            return {**layers, **veto}

        def barrier_each_stage(c):
            nrm = jax.lax.optimization_barrier(
                F.surface_normals(c, res, ccfg.normals_radius)
            )
            sl = jax.lax.optimization_barrier(
                F.slope_from_normals(
                    nrm["surface_normal_z"], ccfg.slope_critical_value
                )
            )
            st = jax.lax.optimization_barrier(
                F.step_layer(
                    c, res, ccfg.step_critical_value,
                    ccfg.step_first_window_radius,
                    ccfg.step_second_window_radius,
                    ccfg.step_critical_cell_number,
                )
            )
            rg = jax.lax.optimization_barrier(
                F.roughness_layer(
                    c, nrm, res, ccfg.roughness_critical_value,
                    ccfg.roughness_estimation_radius,
                )
            )
            trav = (sl + st + rg) / 3.0
            sok = jax.lax.optimization_barrier(
                V._count_veto_ok(sl, res, vcfg.slope_n_critical)
            )
            stok = jax.lax.optimization_barrier(
                V.step_veto_ok(c, st, vcfg)
            )
            return {
                "traversability": trav, "traversability_slope": sl,
                "traversability_step": st, "traversability_roughness": rg,
                "slope_ok": sok, "step_ok": stok,
                "traversable_mask": sok & stok,
            }

        for name, fn in {
            "fused": fused_all,
            "barrier_chain_veto": barrier_chain_veto,
            "barrier_each_stage": barrier_each_stage,
        }.items():
            t = slope(plane_loop(fn), elev)
            emit({
                "exp": "E6_schedule", "size": args.size, "variant": name,
                "t_ms": round(t * 1e3, 4),
            })

        # two separate compiled programs, chained through HBM
        def make_two_prog(k):
            @jax.jit
            def chain_prog(e):
                def body(c, _):
                    layers = F.run_chain(c, ccfg)
                    acc = jnp.zeros_like(c)
                    for v in layers.values():
                        acc = acc + jnp.nan_to_num(v)
                    return c + 1e-12 * acc, None

                c, _ = jax.lax.scan(body, e, None, length=k)
                return c[0, 0]

            return chain_prog

        def make_veto_prog(k):
            @jax.jit
            def veto_prog(e):
                def body(c, _):
                    veto = V.compute_veto_fields(
                        {
                            "elevation": c,
                            "traversability_slope": slope_l + 0.0 * c[0, 0],
                            "traversability_step": step_l + 0.0 * c[0, 0],
                        },
                        vcfg,
                    )
                    acc = jnp.zeros_like(c)
                    for v in veto.values():
                        acc = acc + (
                            jnp.nan_to_num(v)
                            if jnp.issubdtype(v.dtype, jnp.floating)
                            else v.astype(jnp.float32)
                        )
                    return c + 1e-12 * acc, None

                c, _ = jax.lax.scan(body, e, None, length=k)
                return c[0, 0]

            return veto_prog

        t_chain = slope(make_two_prog, elev)
        t_veto = slope(make_veto_prog, elev)
        emit({
            "exp": "E6_schedule", "size": args.size, "variant": "two_programs",
            "t_ms": round((t_chain + t_veto) * 1e3, 4),
            "t_chain_ms": round(t_chain * 1e3, 4),
            "t_veto_ms": round(t_veto * 1e3, 4),
        })


if __name__ == "__main__":
    main()
