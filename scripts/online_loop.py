"""Online update loop demo — BASELINE.json config 4.

A persistent large map (default 50 m x 50 m @ 0.03 m = 1667^2 cells) receives
robot-centric elevation submaps at a target rate while a planner keeps issuing
batched footprint-path queries. Prints per-tick latency percentiles: the
reference runs this loop at 0.2-4 Hz single-threaded; here one chip sustains
far beyond the 10 Hz target.

Usage: python scripts/online_loop.py [--map-m 50] [--seconds 10] [--rate 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map-m", type=float, default=50.0)
    ap.add_argument("--res", type=float, default=0.03)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--rate", type=float, default=10.0)
    ap.add_argument("--paths", type=int, default=256)
    ap.add_argument(
        "--window-m",
        type=float,
        default=0.0,
        help="bounded-memory roaming: keep only a window-m wide map recentred "
        "on the robot each tick (GridMap.recenter); 0 = persistent world map",
    )
    ap.add_argument("--json", default="", help="write a result JSON line here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from traversability_estimation_tpu.models import TraversabilityEstimator
    from traversability_estimation_tpu.utils.config import EstimatorConfig
    from traversability_estimation_tpu.utils.profiling import LatencyTracker
    from traversability_estimation_tpu.utils.sources import SyntheticTerrainSource

    res = args.res
    roaming = args.window_m > 0.0
    n = int(round((args.window_m if roaming else args.map_m) / res))
    print(
        f"map {n}x{n} cells ({'bounded window ' + str(args.window_m) if roaming else args.map_m} m "
        f"@ {res} m), devices={jax.devices()}",
        file=sys.stderr,
    )

    est = TraversabilityEstimator(EstimatorConfig(resolution=res))
    est.set_elevation_map(np.full((n, n), np.nan, np.float32))
    src = SyntheticTerrainSource(resolution=res)

    rng = np.random.default_rng(0)
    update_lat = LatencyTracker()
    query_lat = LatencyTracker()
    period = 1.0 / args.rate
    tick = 0
    # warm compile before the timed loop
    patch, _ = src.sample((0.0, 0.0), (4.0, 4.0))
    est.update_with_submap(patch, (0.0, 0.0))

    t_end = time.time() + args.seconds
    while time.time() < t_end:
        t_tick = time.time()
        # robot drives a circle of radius map/4
        theta = 0.15 * tick
        cx = args.map_m / 4 * np.cos(theta)
        cy = args.map_m / 4 * np.sin(theta)
        patch, _ = src.sample((cx, cy), (4.0, 4.0))
        with update_lat.timed():
            if roaming:
                # bounded-memory roam: the fixed-size window follows the
                # robot; overlap rolls, only new terrain is refreshed
                est.recenter((cx, cy))
            est.update_with_submap(patch, (cx, cy))
            # force true completion (see query note below)
            np.asarray(est.traversability_map["traversability"][:1, :1])
        # planner queries around the robot
        P, N = args.paths, 10
        starts = np.stack(
            [cx + rng.uniform(-1.5, 1.5, P), cy + rng.uniform(-1.5, 1.5, P)], -1
        )
        steps = rng.uniform(-0.1, 0.1, (P, N - 1, 2))
        poses = np.concatenate(
            [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
        ).astype(np.float32)
        with query_lat.timed():
            safe, trav = est.check_circular_paths_batch(
                poses, np.full((P,), N, np.int32), 0.3
            )
            # host fetch forces true completion: on tunneled dev transports
            # block_until_ready acks before device execution finishes
            safe = np.asarray(safe)
        tick += 1
        sleep = period - (time.time() - t_tick)
        if sleep > 0:
            time.sleep(sleep)

    print(f"ticks: {tick} over {args.seconds}s (target {args.rate} Hz)")
    print("update latency:", update_lat.summary())
    print("query latency: ", query_lat.summary())
    achieved = tick / args.seconds
    print(f"achieved rate: {achieved:.1f} Hz "
          f"({'OK' if achieved >= min(args.rate, 0.95 * args.rate) else 'UNDER TARGET'})")
    if args.json:
        import json

        blob = {
            "kind": "online_loop",
            "mode": "roaming_window" if roaming else "persistent_map",
            "map_cells": [n, n],
            "target_hz": args.rate,
            "achieved_hz": round(achieved, 2),
            "ticks": tick,
            "update_ms": update_lat.summary(),
            "query_ms": query_lat.summary(),
            "paths_per_tick": args.paths,
        }
        with open(args.json, "w") as f:
            f.write(json.dumps(blob) + "\n")


if __name__ == "__main__":
    main()
