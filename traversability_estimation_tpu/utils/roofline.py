"""Speed-of-light accounting: measured chip peaks + analytic op counts.

The north star asks for "kernels at speed-of-light per chip". For this
workload the hot kernels are elementwise/stencil chains (no matmuls), so the
relevant peaks are the VPU f32 throughput and HBM bandwidth — NOT the MXU
bf16 number on the spec sheet. Both are MEASURED here on the attached chip
(spec sheets don't survive contact with a tunnel transport), and the op/byte
counts are derived analytically from the same config-driven loop structures
the kernels compile from (ops/filters.py, ops/veto.py, ops/footprint.py).

Methodology notes:
- Every timing uses the two-point SLOPE of a data-chained ``lax.scan``
  (t(K2) - t(K1)) / (K2 - K1): transport RTT, dispatch, and compile-cache
  effects cancel, and chained carries stop XLA from eliding iterations.
  (A naive add-loop here measured 1.9 TB/s "bandwidth" — the while loop was
  unrolled and 16 adds fused into one pass. The slope of a flip/mul chain is
  immune.)
- XLA's ``cost_analysis()['flops']`` over-counts for this code (it reported
  3163 flops/cell while the measured kernel ran FASTER than that count could
  execute at peak), so op counts here are hand-derived per stage from the
  kernel loop structure, counting one VPU op per elementwise arithmetic/
  logical instruction (FMA = 1 op = 2 FLOPs) and ZERO for shifted-window
  reads (in a fused stencil those are register reuse / cheap reindexing, so
  this errs toward a HARDER speed-of-light target).
- The HBM floor counts each kernel input read once and each output written
  once (perfect fusion, no spills).
"""

from __future__ import annotations

import math
import time
from typing import Dict

import numpy as np


# ---------------------------------------------------------------------------
# measured peaks
# ---------------------------------------------------------------------------


def _timed_min(fn, *args, reps: int = 3) -> float:
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def measure_vpu_f32_flops(k1: int = 16, k2: int = 64) -> float:
    """Measured f32 FMA throughput [FLOP/s]: K x 256 chained FMAs on a 16 MB
    VMEM-friendly array, slope of two scan lengths. v5e measures ~4.1e12."""
    import jax
    import jax.numpy as jnp

    a = jnp.full((2048, 2048), 0.5, jnp.float32)

    def make(k):
        @jax.jit
        def loop(x):
            def body(c, _):
                for _ in range(256):
                    c = c * 0.9999999 + 1e-7
                return c, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            return c[0, 0]

        return loop

    t1 = _timed_min(make(k1), a)
    t2 = _timed_min(make(k2), a)
    return 2.0 * a.size * 256 * (k2 - k1) / max(t2 - t1, 1e-9)


def measure_vpu_bool_ops(k1: int = 16, k2: int = 64) -> float:
    """Measured boolean/mask op throughput [ops/s]: K x 256 chained mask ops
    on bool planes, ROTATING through 8 distinct operands and mixing
    and/or/xor/andnot. The update kernels are mask-heavy (the step-gap walk
    is ~60% i1 ops); if masks issue faster than the FMA rate, a model that
    prices every logical op at FMA cost overstates the compute bound — the
    source of the r02 'achieved 116% of SoL' (VERDICT weak #3).

    The rotation + mix matters: an earlier two-constant ``(c ^ a) | b``
    chain measured anywhere from 1.6x to 5.3x the f32 issue rate across
    sessions (XLA/Mosaic sometimes found a packed layout or simplification
    for the repeated pattern); the mixed chain tracks what mask-heavy
    kernels actually achieve."""
    import jax
    import jax.numpy as jnp
    import numpy as np_

    rng = np_.random.default_rng(0)
    ops_per_iter = 256
    operands = [
        jnp.asarray(rng.random((2048, 2048)) < 0.5) for _ in range(8)
    ]

    def make(k):
        @jax.jit
        def loop(x):
            def body(c, _):
                for i in range(ops_per_iter // 4):
                    c = c & operands[i % 8]
                    c = c | operands[(i + 3) % 8]
                    c = c ^ operands[(i + 5) % 8]
                    # andnot + xor, both involving the carry so neither the
                    # algebraic simplifier (x | (y & ~x) == x | y — the fold
                    # the previous form was exposed to, ADVICE r4) nor
                    # loop-invariant hoisting (a & ~b with a,b constants)
                    # can remove issue slots from the chain.
                    c = (operands[(i + 1) % 8] & ~c) ^ operands[(i + 2) % 8]
                return c, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            return c[0, 0]

        return loop

    # the andnot+xor line is 2 ops -> 5 ops per 4-line group
    total_ops = (ops_per_iter // 4) * 5
    t1 = _timed_min(make(k1), operands[7])
    t2 = _timed_min(make(k2), operands[7])
    return operands[0].size * total_ops * (k2 - k1) / max(t2 - t1, 1e-9)


def measure_peaks(
    k1: int = 16, k2: int = 64, repeats: int = 3
) -> Dict[str, float]:
    """THE peaks block — one measurement feeding every SoL artifact.

    VERDICT r3 weak #2: BENCH_r03 and CALIB_last carried peak numbers that
    disagreed ~2x because one printed FLOP/s (FMA chain, 1 FMA = 2 FLOP) and
    the other printed the op ISSUE rate (= FLOP/s / 2) without saying so.
    This routine returns both under explicit names; `bench.py` and
    `scripts/calibrate_sol.py` both embed this exact block in their
    artifacts so stage rows and fused rows are commensurable.

    Conventions (docs/DESIGN.md §6):
    - ``vpu_f32_flops_per_s``: FMA-chain throughput in FLOP/s.
    - ``vpu_f32_ops_per_s``:   FLOP/s / 2 — the per-lane ISSUE rate; every
      f32 arithmetic/compare/select/int-add op in the analytic counts is
      priced at this rate (one op = one issue slot, FMA or not).
    - ``bool_ops_per_s``: i1 mask-op issue rate (xor/and/or chain), ~1.5-1.9x
      the f32 issue rate on v5e.
    - ``hbm_bytes_per_s``: read+write streaming bandwidth (multiply chain).

    Each probe runs ``repeats`` times and the MAX is kept (round 5): a peak
    is a CAPABILITY, so the right estimator is the best observed rate —
    single-shot probes read the i1 rate anywhere in 3.2-4.1 Tops/s across
    sessions (schedule + session luck), which made the SoL bound itself
    session-soft; max-of-3 converges to the hard bound.
    """
    reps = repeats
    flops = max(measure_vpu_f32_flops(k1, k2) for _ in range(reps))
    bools = max(measure_vpu_bool_ops(k1, k2) for _ in range(reps))
    hbm = max(measure_hbm_bw() for _ in range(reps))
    return {
        "vpu_f32_flops_per_s": flops,
        "vpu_f32_ops_per_s": flops / 2.0,
        "bool_ops_per_s": bools,
        "bool_to_f32_ratio": round(bools / (flops / 2.0), 3),
        "hbm_bytes_per_s": hbm,
        "convention": (
            "FMA chain; ops = FLOPs/2 = issue rate (all f32 bounds price "
            "per-op at this); bool = i1 xor/and/or chain; each peak = max "
            f"of {reps} probe repeats (a capability, not a sample)"
        ),
    }


def measure_hbm_bw(k1: int = 8, k2: int = 40) -> float:
    """Measured HBM read+write bandwidth [B/s]: chained multiplies on a
    256 MB array (not collapsible without float reassociation), slope of two
    scan lengths. v5e measures ~6.7e11 (82% of the 819 GB/s spec)."""
    import jax
    import jax.numpy as jnp

    b = jnp.ones((8192, 8192), jnp.float32)

    def make(k):
        @jax.jit
        def loop(x):
            def body(c, _):
                return c * 1.0000001, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            return c[0, 0]

        return loop

    t1 = _timed_min(make(k1), b)
    t2 = _timed_min(make(k2), b)
    return 2.0 * b.size * 4 * (k2 - k1) / max(t2 - t1, 1e-9)


# ---------------------------------------------------------------------------
# analytic op counts (per cell) for the fused update step
# ---------------------------------------------------------------------------


def _n_offsets(radius: float, resolution: float) -> int:
    from traversability_estimation_tpu.grid.geometry import circle_offsets

    return len(circle_offsets(radius, resolution))


def update_op_estimate(chain_cfg, veto_cfg) -> Dict[str, float]:
    """Per-cell VPU-op / shifted-plane / HBM-byte counts of the fused update
    step (ops/filters.run_chain + ops/veto.compute_veto_fields), per stage.

    Constants are instruction counts read off the kernel loop bodies AFTER
    the simplifications XLA provably applies to the shapes bench compiles
    (the unsharded ``in_map`` is a constant-True plane, so every ``& in_map``
    folds away), split into THREE issue classes calibrated on the chip
    (scripts/calibrate_sol.py, scripts/ablate_update.py):

    - ``f32``: float arithmetic, comparisons, selects, int adds/ors — issue
      at the measured FMA op rate (one op/lane/cycle).
    - ``bool``: i1 and/or/xor mask ops — measured to issue at ~1.6-2.3x the
      f32 rate on v5e (xor/and/or chain); pricing these at f32 rate was the
      r02 model's inflation (VERDICT r2 weak #3).
    - ``shifts``: shifted-plane reads (pad + static slice). These are NOT
      free: each unaligned static shift is a vector relayout, measured
      0.03 us (row-only) / 0.12 us (lane) / 0.22 us (diagonal) per 336^2
      f32 plane (ABLATE_last.json E1) — a real cost the round-3 model
      priced at zero, which is why its shift-heavy stages (veto counts, the
      old 84-bool-shift candidate combine) read 45-52% "of bound". Priced
      at the measured diagonal rate via ``measure_static_shift_cost``
      (harder bound: most shifts here are diagonal-ish).

    Stage counts are cross-checked against isolated-stage slope timings on
    the chip (calibrate_sol, elementwise plane-carry consumption — a nansum
    consumption breaks stage fusion and inflated the round-3 rows, e.g.
    step read 10.3% then, ~100% measured honestly). Stages whose isolated
    reading exceeds 100% of their bound are flagged ``model_inflated`` in
    CALIB_last (the hand count over-estimates what XLA actually issues
    there); the aggregate check is the TOTAL row — the isolated stage SUM
    measures within ~5% of the summed model across sessions, so the
    stage-additive bound that the fused pct_sol is quoted against is
    calibrated in aggregate even where individual stage counts drift ±20%.
    """
    res = chain_cfg.resolution

    # surface_normals (filters.py): per offset ~12 arithmetic ops
    # (centered z, 9 moment accumulations with constant dx/dy folded to FMAs,
    # z*z) + 2 shifted reads (validity, elevation); finishing: 6 covariance
    # normalizations (~16), Jacobi 4 sweeps x 3 rotations x ~30 ops + eigvec
    # pick (~380 total; 3 sweeps measured golden-identical but weaken
    # cross-compilation eigenvector agreement — see smallest_eigvec_planes).
    n_norm = _n_offsets(chain_cfg.normals_radius, res)
    st_normals = (12 * n_norm + 16 + 380, 0, 2 * n_norm)

    # slope (filters.py:263-268): acos polynomial (8 FMAs + sqrt + selects
    # ~14) + map to 1 - slope/critical (~4)
    st_slope = (18, 0, 0)

    # step_layer (filters.py:271-318, packed-sentinel form): input planes
    # 2 selects + isfinite; pass 1 per offset: max + min (2 shifted reads);
    # pass 2 per offset: max + compare + select + add (1 shifted read);
    # finishing ~13 (any1/any2 sentinel compares, step_height select,
    # sh_max_in select, clamp, min, mul, div, compare, NaN mask)
    n_s1 = _n_offsets(chain_cfg.step_first_window_radius, res)
    n_s2 = _n_offsets(chain_cfg.step_second_window_radius, res)
    # finishing ~11: isolated-stage calibration read 105.6% of the bound at
    # 13 (model_inflated), implying XLA folds ~2 of the hand-counted ops
    st_step = (3 + 2 * n_s1 + 4 * n_s2 + 11, 2, 2 * n_s1 + n_s2)

    # roughness (filters.py roughness_layer): when its radius matches the
    # normals radius the moment planes are computed ONCE and shared
    # (run_chain passes moment_planes to both stages), so the shared case
    # counts only the finishing math (~35: scatter-matrix assembly, quad
    # form, sqrt + map); the unshared case pays the full moment loop.
    n_rgh = (
        _n_offsets(chain_cfg.roughness_estimation_radius, res)
        if chain_cfg.compute_roughness
        else 0
    )
    moments_shared = (
        chain_cfg.compute_roughness
        and chain_cfg.roughness_estimation_radius == chain_cfg.normals_radius
    )
    if not chain_cfg.compute_roughness:
        st_rough = (0, 0, 0)
    elif moments_shared:
        st_rough = (35, 0, 0)
    else:
        st_rough = (12 * n_rgh + 30, 0, 2 * n_rgh)

    # fusion + NaN handling (~8)
    st_fuse = (8, 0, 0)

    # veto slope/roughness counts (veto.py, row-span box-sum form): the
    # 3-cell disc decomposes into box sums per distinct row span (widths
    # 7/5/1 -> 10 col adds + col shifts) + a vertical combine (6 row adds +
    # row shifts); prep cmp + cast, finish cmp + 2
    mult = 2 if veto_cfg.check_roughness else 1
    st_veto_cnt = ((10 + 6 + 5) * mult, 0, 16 * mult)

    # step veto (veto.py step_veto_ok, round-5 sentinel-folded formulation;
    # the round-4 bool-plane form is step_veto_ok_v1, A/B'd in ABLATE E12;
    # a bit-packed int32 variant measured 1.5x slower, ABLATE E7):
    # sentinel planes selev/welev ~6 f32 ops once; per walk step 1 shifted
    # welev read + 3 f32 compares (wall, gap, isnan) + ~9 mask ops;
    # triggers 8 x (cmp on a shifted selev read shared with the candidate
    # disc) + ~3 masks each; candidate combine per non-center offset 2
    # shifted reads (selev — 8 of the 20 shared with triggers — and the
    # sector fail plane) + 2 cmps + ~3 masks; sector-plane builds ~45 bool
    # + casts; self-fallback 8 + final ~4.
    from traversability_estimation_tpu.ops.veto import _ray_directions

    walk_steps = sum(k for _, _, k in _ray_directions(veto_cfg))
    n_cand_nc = _n_offsets(2.5 * res, res) - 1  # (0,0) never a candidate
    st_walk = (
        3 * walk_steps + 8 + 2 * n_cand_nc + 6,
        9 * walk_steps + 3 * 8 + 3 * n_cand_nc + 45 + 8 + 4,
        walk_steps + 2 * n_cand_nc,
    )

    breakdown = {
        "normals": st_normals,
        "slope": st_slope,
        "step": st_step,
        "roughness": st_rough,
        "fusion": st_fuse,
        "veto_counts": st_veto_cnt,
        "veto_step_walk": st_walk,
    }
    f32_ops = float(sum(f for f, _, _ in breakdown.values()))
    bool_ops = float(sum(b for _, b, _ in breakdown.values()))
    shifts = float(sum(s for _, _, s in breakdown.values()))

    # HBM floor: read elevation once; write traversability, slope, step,
    # [roughness], and the bool veto mask once (perfect fusion)
    n_out_f32 = 3 + (1 if chain_cfg.compute_roughness else 0)
    bytes_per_cell = 4 + 4 * n_out_f32 + 1

    return {
        "ops_per_cell": f32_ops + bool_ops,
        "f32_ops_per_cell": f32_ops,
        "bool_ops_per_cell": bool_ops,
        "shifted_planes": shifts,
        "hbm_bytes_per_cell": float(bytes_per_cell),
        "breakdown": {
            k: {"f32": f, "bool": b, "shifts": s}
            for k, (f, b, s) in breakdown.items()
        },
    }


def circle_field_op_estimate(
    radius_max: float, resolution: float
) -> Dict[str, float]:
    """Per-cell counts for ops/footprint.dense_circle_field: the spiral
    window becomes shifted-plane reductions — per in-window offset ~4 ops
    (fail OR with radius class, pass count add, traversability FMA); plus
    ~20 finishing ops (inflation factor, means, verdict selects).

    NOTE: this arithmetic bound is NOT the binding floor for this kernel —
    unaligned dynamic shifts of an (H, W) plane cost a vector relayout,
    ~10x the arithmetic (measured; see ``measure_shift_floor`` and
    docs/DESIGN.md §7). pct_sol for the field is reported against the
    relayout floor."""
    n_window = _n_offsets(radius_max, resolution)
    return {
        "ops_per_cell": 4.0 * n_window + 20.0,
        # read the packed query plane; write verdict + value planes
        "hbm_bytes_per_cell": 4.0 + 1.0 + 4.0,
        "n_offsets": float(n_window),
    }


def measure_static_shift_cost(
    shape: tuple, n_shifts: int = 16, k1: int = 16, k2: int = 64,
    vpu_f32_ops_per_s: float | None = None,
) -> float:
    """Seconds per STATIC (pad + slice) diagonal plane shift at `shape`.

    The fused update's stencils read shifted planes; each unaligned static
    shift is a vector relayout (measured 0.03-0.22 us per 336^2 plane by
    direction — ABLATE_last.json E1). The diagonal rate is used to price the
    model's ``shifted_planes`` class (hardest common case). The loop
    accumulates one add per shift; that add is charged analytically at the
    f32 issue rate when given (an earlier zero-offset baseline loop folded
    to a single multiply and measured garbage under transport jitter)."""
    import jax
    import jax.numpy as jnp

    H, W = shape
    a = jnp.ones((H, W), jnp.float32)
    offs = [((i % 7) - 3 or 1, (i % 5) - 2 or 1) for i in range(n_shifts)]

    def mk(k):
        @jax.jit
        def loop(x):
            def body(c, _):
                acc = jnp.zeros_like(c)
                for di, dj in offs:
                    padded = jnp.pad(
                        c,
                        (
                            (max(-di, 0), max(di, 0)),
                            (max(-dj, 0), max(dj, 0)),
                        ),
                    )
                    acc = acc + padded[
                        max(di, 0) : max(di, 0) + H,
                        max(dj, 0) : max(dj, 0) + W,
                    ]
                return c + 1e-12 * acc, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            return c[0, 0]

        return loop

    t1 = _timed_min(mk(k1), a)
    t2 = _timed_min(mk(k2), a)
    per_iter = max(t2 - t1, 1e-9) / (k2 - k1)
    t_adds = (
        n_shifts * H * W / vpu_f32_ops_per_s if vpu_f32_ops_per_s else 0.0
    )
    return max(per_iter - t_adds, 0.0) / n_shifts


def measure_shift_floor(
    shape: tuple, n_offsets: int, pad: int, k1: int = 8, k2: int = 24
) -> float:
    """Seconds for `n_offsets` sequential unaligned plane shifts — the
    algorithmic floor of any exact-spiral-order field kernel.

    Measures a 1-carry scan doing ONLY `cnt += dynamic_slice(pad_plane,
    offset)` over the same offset count: each unaligned shift is a vector
    relayout on TPU (both XLA dynamic_slice and Mosaic lane/sublane rotates
    pay it), and this cost — not the ~4 arithmetic ops per offset —
    dominates the kernel. The real field runs ~1.4x this floor (it reads 3
    planes and carries 6, amortized against the same relayouts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np_

    H, W = shape
    rng = np_.random.default_rng(0)
    padp = jnp.asarray(
        rng.random((H + 2 * pad, W + 2 * pad)).astype(np_.float32)
    )
    offs = jnp.asarray(
        rng.integers(0, 2 * pad, size=(n_offsets, 2)), jnp.int32
    )

    def make(k):
        @jax.jit
        def loop(t):
            def outer(c, _):
                def body(cnt, off):
                    return (
                        cnt
                        + jax.lax.dynamic_slice(
                            padp, (off[0], off[1]), (H, W)
                        ),
                        None,
                    )

                cnt, _ = jax.lax.scan(body, jnp.zeros((H, W)) + c, offs)
                return c + 1e-12 * cnt[0, 0], None

            c, _ = jax.lax.scan(outer, t, None, length=k)
            return c

        return loop

    t1 = _timed_min(make(k1), jnp.float32(0))
    t2 = _timed_min(make(k2), jnp.float32(0))
    return max(t2 - t1, 1e-9) / (k2 - k1)


def sol_report(
    cells: int,
    t_measured: float,
    counts: Dict[str, float],
    vpu_flops: float,
    hbm_bw: float,
    bool_ops_per_s: float | None = None,
    shift_cost_s: float | None = None,
) -> Dict[str, float]:
    """Roofline verdict: pct_sol = (max of the floors) / measured time.

    VPU op peak = measured FMA FLOP/s / 2 (one FMA issue per lane per cycle;
    float compares/selects and int adds issue at the same rate). i1 mask ops
    are priced at the separately measured ``bool_ops_per_s`` when the counts
    carry a ``bool_ops_per_cell`` class (measured ~1.6-2.3x the f32 rate on
    v5e); with no bool rate given they price at the f32 rate (harder bound).
    When ``shift_cost_s`` (seconds per shifted plane at this `cells`,
    ``measure_static_shift_cost``) and a ``shifted_planes`` count are given,
    the relayout time ADDS to the compute bound — relayouts are VPU work,
    serial with the arithmetic."""
    vpu_ops_per_s = vpu_flops / 2.0
    if bool_ops_per_s and "bool_ops_per_cell" in counts:
        t_compute = cells * (
            counts["f32_ops_per_cell"] / vpu_ops_per_s
            + counts["bool_ops_per_cell"] / bool_ops_per_s
        )
    else:
        t_compute = cells * counts["ops_per_cell"] / vpu_ops_per_s
    t_shift = (
        counts.get("shifted_planes", 0.0) * shift_cost_s
        if shift_cost_s
        else 0.0
    )
    t_compute = t_compute + t_shift
    t_memory = cells * counts["hbm_bytes_per_cell"] / hbm_bw
    bound = max(t_compute, t_memory)
    return {
        "t_compute_bound_s": t_compute,
        "t_shift_bound_s": t_shift,
        "t_memory_bound_s": t_memory,
        "binding": "compute" if t_compute >= t_memory else "memory",
        "pct_sol": 100.0 * bound / max(t_measured, 1e-12),
    }
