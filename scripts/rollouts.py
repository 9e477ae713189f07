"""Planner-in-the-loop rollout benchmark — BASELINE.json config 5.

100k footprint-path rollouts per replanning step over a 200 m x 200 m map
(6667^2 = 44M cells @ 0.03 m). Each step: refresh the map region around the
robot, rebuild the dense circle field, score all rollouts, pick the best safe
path — the replanning budget is the wall time of one full cycle.

Single-chip by default; on a multi-chip mesh the same query runs with the
pose batch sharded over all devices (see parallel/).

Usage: python scripts/rollouts.py [--rollouts 100000] [--map-m 200] [--steps 5]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map-m", type=float, default=200.0)
    ap.add_argument("--res", type=float, default=0.03)
    ap.add_argument("--rollouts", type=int, default=100_000)
    ap.add_argument("--poses", type=int, default=12)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from traversability_estimation_tpu.models import TraversabilityEstimator
    from traversability_estimation_tpu.utils.config import EstimatorConfig
    from traversability_estimation_tpu.utils.sources import SyntheticTerrainSource

    res = args.res
    n = int(round(args.map_m / res))
    print(
        f"map {n}x{n} = {n*n/1e6:.0f}M cells, {args.rollouts} rollouts x "
        f"{args.poses} poses, devices={jax.devices()}",
        file=sys.stderr,
    )

    est = TraversabilityEstimator(EstimatorConfig(resolution=res))
    src = SyntheticTerrainSource(resolution=res)
    # initial world: synthesize the full map once (chunks to bound host RAM)
    elev = np.empty((n, n), np.float32)
    chunk = 1024
    for i0 in range(0, n, chunk):
        rows = min(chunk, n - i0)
        cy = 0.0
        cx = args.map_m / 2 - (i0 + rows / 2) * res
        patch, _ = src.sample((cx, cy), (rows * res, args.map_m))
        elev[i0 : i0 + rows] = patch
    t0 = time.time()
    est.update(elev)
    print(f"initial full-map update: {time.time()-t0:.2f}s "
          f"(steady {est.last_update_seconds*1e3:.1f} ms)", file=sys.stderr)

    rng = np.random.default_rng(0)
    P, N = args.rollouts, args.poses
    # pick a traversable start: single-pose circle checks over candidates
    cand = np.stack(
        [rng.uniform(-20, 20, 256), rng.uniform(-20, 20, 256)], -1
    ).astype(np.float32)[:, None, :]
    ok, _ = est.check_circular_paths_batch(
        cand, np.ones(256, np.int32), 0.3, crop=False
    )
    ok = np.asarray(ok)
    if not ok.any():
        print("no traversable start found", file=sys.stderr)
        return
    robot = cand[int(np.argmax(ok)), 0].astype(np.float64)
    print(f"start at {robot}", file=sys.stderr)
    budgets = []
    for step in range(args.steps):
        t_step = time.time()
        # refresh a 6 m window around the robot (sensor update)
        patch, _ = src.sample(tuple(robot), (6.0, 6.0))
        est.update_with_submap(patch, tuple(robot))
        # rollouts: random-walk candidate paths from the robot
        headings = rng.uniform(0, 2 * np.pi, P)
        base = np.stack([np.cos(headings), np.sin(headings)], -1) * 0.25
        steps_xy = base[:, None, :] + rng.uniform(-0.08, 0.08, (P, N - 1, 2))
        poses = np.concatenate(
            [np.broadcast_to(robot, (P, 1, 2)), robot + np.cumsum(steps_xy, 1)],
            axis=1,
        ).astype(np.float32)
        safe, trav = est.check_circular_paths_batch(
            poses, np.full((P,), N, np.int32), 0.3
        )
        jax.block_until_ready((safe, trav))
        safe = np.asarray(safe)
        trav = np.asarray(trav)
        budget = time.time() - t_step
        budgets.append(budget)
        best = int(np.argmax(np.where(safe, trav, -1.0)))
        print(
            f"step {step}: {budget*1e3:7.1f} ms budget | safe {safe.sum():>6}/{P} "
            f"| best trav {trav[best]:.3f}",
            file=sys.stderr,
        )
        if safe[best]:
            robot = poses[best, min(3, N - 1), :].astype(np.float64)

    steady = float(np.median(budgets[1:])) if len(budgets) > 1 else budgets[0]
    print(
        f"replanning budget p50: {steady*1e3:.1f} ms -> "
        f"{args.rollouts * args.poses / steady/1e6:.1f}M pose-checks/s sustained"
    )


if __name__ == "__main__":
    main()
