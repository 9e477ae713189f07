"""Per-stage SoL calibration on the real chip (VERDICT r2 weak #3).

The r02 bench measured the fused update at 116% of the roofline model's
compute bound — i.e. at least one stage's hand-derived op count is inflated
and "~100% of SoL" was an extrapolation. This script times each stage of the
update IN ISOLATION with the chained-lax.scan slope methodology (transport
RTT and dispatch cancel) and compares against the model's per-stage counts
(utils/roofline.update_op_estimate breakdown):

    implied_ops_ceiling = t_measured * measured_vpu_ops_per_s / cells

is the most ops that stage can actually be executing — the model may not
claim more. Output: one JSON line per stage + a summary with the calibrated
total, to be folded back into roofline.update_op_estimate.

Run: python scripts/calibrate_sol.py            (real chip)
     JAX_PLATFORMS=cpu python scripts/calibrate_sol.py   (plumbing smoke)
"""

from __future__ import annotations

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
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=672)  # 4x bench cells: stage times ~4x above tunnel timing jitter
    ap.add_argument("--k1", type=int, default=16)
    ap.add_argument("--k2", type=int, default=48)
    ap.add_argument("--cpu", action="store_true")
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

    from traversability_estimation_tpu.ops import filters as F
    from traversability_estimation_tpu.ops import veto as V
    from traversability_estimation_tpu.utils import roofline

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

    # fixed auxiliary inputs (perturbed by the carry inside each loop so
    # iterations stay data-dependent)
    normals = F.surface_normals(elev, res, ccfg.normals_radius)
    nz = normals["surface_normal_z"]
    slope_l = F.slope_from_normals(nz, ccfg.slope_critical_value)
    step_l = F.step_layer(
        elev, res, ccfg.step_critical_value, ccfg.step_first_window_radius,
        ccfg.step_second_window_radius, ccfg.step_critical_cell_number,
    )
    jax.block_until_ready((slope_l, step_l))

    def timed_slope(make_loop):
        """Two-point slope with adaptive scan lengths (fast stages measured
        literal 0.0 ms at K=16/48 against transport jitter); canonical
        implementation in utils/profiling.adaptive_slope."""
        from traversability_estimation_tpu.utils.profiling import (
            adaptive_slope,
        )

        return adaptive_slope(
            make_loop, elev, args.k1, args.k2, 2e-3, log=log
        )

    def scan_loop(stage_fn):
        def make(k):
            @jax.jit
            def loop(e):
                def body(c, _):
                    out = stage_fn(c)
                    # consume the stage output ELEMENTWISE into the plane
                    # carry — same discipline as bench.py's fused-update
                    # loop. A scalar out[0, 0] dependence lets XLA shrink
                    # the stage to one cell's neighborhood (observed 0.0 ms
                    # rows); a full nansum reduction keeps all cells live
                    # but breaks the stage's fusion into a separate
                    # reduction pass (+50% measured on the fused update),
                    # which was inflating the round-3 stage rows (the step
                    # stage read 10.3% of bound partly for this reason).
                    return c + 1e-12 * jnp.nan_to_num(out), None

                c, _ = jax.lax.scan(body, e, None, length=k)
                return c[0, 0]

            return loop

        return make

    stages = {
        "normals": lambda c: F.surface_normals(c, res, ccfg.normals_radius)[
            "surface_normal_z"
        ],
        "slope": lambda c: F.slope_from_normals(
            nz + 0.0 * c[0, 0], ccfg.slope_critical_value
        ),
        "step": lambda c: F.step_layer(
            c, res, ccfg.step_critical_value, ccfg.step_first_window_radius,
            ccfg.step_second_window_radius, ccfg.step_critical_cell_number,
        ),
        "roughness": lambda c: F.roughness_layer(
            c, {k: v + 0.0 * c[0, 0] for k, v in normals.items()}, res,
            ccfg.roughness_critical_value, ccfg.roughness_estimation_radius,
        ),
        "veto_counts": lambda c: V._count_veto_ok(
            slope_l + 0.0 * c[0, 0], res, vcfg.slope_n_critical
        ).astype(jnp.float32),
        "veto_step_walk": lambda c: V.step_veto_ok(
            c, step_l + 0.0 * c[0, 0], vcfg
        ).astype(jnp.float32),
    }

    # the SAME peaks block bench.py embeds in BENCH_last.json (VERDICT r3
    # weak #2: the two artifacts used to carry incommensurable peak numbers —
    # FLOP/s in one, issue-rate ops/s in the other, neither labeled)
    peaks = roofline.measure_peaks()
    vpu_ops = peaks["vpu_f32_ops_per_s"]
    bool_ops = peaks["bool_ops_per_s"]
    log(f"measured VPU: {peaks['vpu_f32_flops_per_s']/1e12:.2f} TFLOP/s -> "
        f"{vpu_ops/1e12:.2f} f32 Tops/s issue rate; "
        f"bool/mask {bool_ops/1e12:.2f} Tops/s "
        f"({peaks['bool_to_f32_ratio']:.2f}x f32 issue rate)")
    print(json.dumps({"stage": "peaks",
                      **{k: (round(v, 4) if isinstance(v, float) else v)
                         for k, v in peaks.items()}}),
          flush=True)

    # per-shift relayout cost at this size (3rd model class; ABLATE E1)
    shift_cost = roofline.measure_static_shift_cost(
        (H, W), vpu_f32_ops_per_s=vpu_ops
    )
    log(f"static shift cost at {H}^2: {shift_cost*1e6:.3f} us/shifted plane")
    print(json.dumps({"stage": "shift_cost",
                      "us_per_shifted_plane": round(shift_cost * 1e6, 4),
                      "size": H}), flush=True)

    model = roofline.update_op_estimate(ccfg, vcfg)["breakdown"]
    # the model's veto_counts entry covers slope (+roughness when on); the
    # isolated stage here is ONE count pass
    model_iso = {k: dict(v) for k, v in model.items()}
    if vcfg.check_roughness:
        for key in ("f32", "bool", "shifts"):
            model_iso["veto_counts"][key] //= 2
    # the fused model shares moment planes between normals and roughness
    # (radii equal); the ISOLATED roughness stage here pays its own moment
    # loop, so its row is bounded by the unshared count
    if ccfg.roughness_estimation_radius == ccfg.normals_radius:
        from traversability_estimation_tpu.grid.geometry import circle_offsets

        n_rgh = len(circle_offsets(ccfg.roughness_estimation_radius, res))
        model_iso["roughness"] = {
            "f32": 12 * n_rgh + 30, "bool": 0, "shifts": 2 * n_rgh,
        }

    def stage_bound(m, with_shifts=True):
        t = cells * (m["f32"] / vpu_ops + m["bool"] / bool_ops)
        if with_shifts:
            t += m.get("shifts", 0) * shift_cost
        return t

    results = {}
    total_meas = 0.0
    for name, fn in stages.items():
        t = timed_slope(scan_loop(fn))
        implied = t * vpu_ops / cells  # all-f32 ceiling (hardest reading)
        m = model_iso.get(name, {"f32": 0, "bool": 0, "shifts": 0})
        t_model = stage_bound(m)
        t_model_ops = stage_bound(m, with_shifts=False)
        row = {
            "stage": name,
            "t_meas_ms": round(t * 1e3, 4),
            "model_f32_ops": float(m["f32"]),
            "model_bool_ops": float(m["bool"]),
            "model_shifted_planes": float(m.get("shifts", 0)),
            "t_model_bound_ms": round(t_model * 1e3, 4),
            "t_model_pure_op_bound_ms": round(t_model_ops * 1e3, 4),
            "stage_pct_sol": round(100 * t_model / t, 1) if t_model else None,
            "stage_pct_sol_pure_op": (
                round(100 * t_model_ops / t, 1) if t_model_ops else None
            ),
            "implied_f32_ops_ceiling": round(implied, 1),
            "model_inflated": bool(t_model > t * 1.02),
        }
        results[name] = row
        total_meas += t
        print(json.dumps(row), flush=True)

    print(
        json.dumps(
            {
                "stage": "TOTAL(isolated sum)",
                "t_meas_ms": round(total_meas * 1e3, 4),
                "t_model_bound_ms": round(
                    sum(
                        stage_bound(
                            model_iso.get(n, {"f32": 0, "bool": 0, "shifts": 0})
                        )
                        for n in stages
                    ) * 1e3, 4
                ),
                "note": (
                    "stage rows bound each model term independently; "
                    "consumption is the elementwise plane carry (a nansum "
                    "consumption broke stage fusion and inflated the "
                    "round-3 rows)"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
