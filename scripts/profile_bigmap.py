"""Decompose the config-5 device-gen 'update' stage on the 44M-cell map.

BENCH_extra's rollouts_device_gen rows put the replanning budget at
188-242 ms p50, with the 'update' stage (sensor patch synth + submap merge
+ incremental region re-filter + sync) the largest term at 90-134 ms. This
script times the pieces on the real chip:

  patch_synth    SyntheticTerrainSource.sample (host numpy)
  merge          estimator.merge_submap (eager dynamic_update_slice of the
                 elevation plane)
  refilter       the crop -> _update_step -> ~10 plane write-backs block
                 (estimator.last_update_seconds)
  sync           the trailing one-element fetch (transport RTT shows here)
  plane_copy     floor: ONE eager dynamic_update_slice of a 256^2 patch
                 into a 6667^2 f32 plane, slope-timed (the per-plane cost
                 the functional write-backs pay ~10x per tick)
  field          cropped state + dense field build (the 'field' stage)

Usage: python scripts/profile_bigmap.py [--map-m 200]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.append(_REPO)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--map-m", type=float, default=200.0)
    ap.add_argument("--res", type=float, default=0.03)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.map_m = min(args.map_m, 12.0)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(_REPO, ".jax_cache_cpu" if args.cpu else ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from traversability_estimation_tpu.models import TraversabilityEstimator
    from traversability_estimation_tpu.utils.config import EstimatorConfig
    from traversability_estimation_tpu.utils.profiling import adaptive_slope
    from traversability_estimation_tpu.utils.sources import (
        SyntheticTerrainSource,
    )

    res = args.res
    n = int(round(args.map_m / res))
    log(f"map {n}x{n}, devices={jax.devices()}")
    est = TraversabilityEstimator(EstimatorConfig(resolution=res))
    src = SyntheticTerrainSource(resolution=res)
    elev = np.empty((n, n), np.float32)
    chunk = 1024
    for i0 in range(0, n, chunk):
        rows = min(chunk, n - i0)
        cx = args.map_m / 2 - (i0 + rows / 2) * res
        patch, _ = src.sample((cx, 0.0), (rows * res, args.map_m))
        elev[i0 : i0 + rows] = patch
    t0 = time.time()
    est.update(elev)
    log(f"initial update: {time.time()-t0:.1f}s")

    robot = np.array([0.0, 0.0])
    rows = {"kind": "profile_bigmap", "map_cells": [n, n],
            "backend": jax.devices()[0].platform}
    acc = {k: [] for k in ("patch_synth", "merge", "refilter", "sync",
                           "field")}
    radius, offset = 0.3, est.config.footprint.circular_footprint_offset
    reach = 3.0
    for step in range(args.steps):
        t0 = time.time()
        patch, _ = src.sample(tuple(robot), (6.0, 6.0))
        t1 = time.time()
        # split merge from refilter by calling the pieces update_with_submap
        # uses (same order)
        bounds = est._merge_bounds(patch, tuple(robot))
        assert bounds is not None
        est.merge_submap(patch, tuple(robot))
        jax.block_until_ready(est._elevation)
        t2 = time.time()
        est.update_with_submap(
            np.asarray(patch), tuple(robot)
        )  # re-merge (same values) + refilter; merge cost counted above
        t3 = time.time()
        np.asarray(est.traversability_map["traversability"][:1, :1])
        t4 = time.time()
        corners = np.array(
            [[robot[0] - reach, robot[1] - reach],
             [robot[0] + reach, robot[1] + reach]], np.float32,
        )
        state, field = est._cropped_state_and_field(corners, radius, offset)
        jax.block_until_ready(field)
        t5 = time.time()
        acc["patch_synth"].append(t1 - t0)
        acc["merge"].append(t2 - t1)
        acc["refilter"].append(t3 - t2)
        acc["sync"].append(t4 - t3)
        acc["field"].append(t5 - t4)
        log(f"step {step}: synth {1e3*(t1-t0):.1f} merge {1e3*(t2-t1):.1f} "
            f"refilter {1e3*(t3-t2):.1f} (est.last_update "
            f"{est.last_update_seconds*1e3:.1f}) sync {1e3*(t4-t3):.1f} "
            f"field {1e3*(t5-t4):.1f} ms")
        robot = robot + np.array([0.3, 0.2])

    for k, v in acc.items():
        rows[f"{k}_p50_ms"] = round(float(np.median(v[1:])) * 1e3, 1)

    # plane-copy floor: one functional dynamic_update_slice into a full
    # plane (what each of the ~10 write-backs pays)
    plane = jnp.zeros((n, n), jnp.float32)
    small = jnp.ones((256, 256), jnp.float32)

    def make(k):
        @jax.jit
        def loop(p):
            def body(c, _):
                c = jax.lax.dynamic_update_slice(c, small + c[0, 0], (100, 100))
                return c, None

            c, _ = jax.lax.scan(body, p, None, length=k)
            return c[0, 0]

        return loop

    t_copy = adaptive_slope(make, plane, 4, 12, 2e-3, log=log)
    rows["plane_copy_ms"] = round(t_copy * 1e3, 2)
    n_layers = len(est._map.layers)
    rows["n_layer_planes"] = n_layers
    rows["copy_floor_total_ms"] = round(t_copy * 1e3 * n_layers, 1)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
