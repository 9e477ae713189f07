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


def run_tiled(args, elev, res):
    """Config 5's large-map distributed mode: the map stays SHARDED over the
    ('x','y') mesh — halo-exchange update, per-tile dense circle field, and
    rollout verdicts assembled by pmin/psum reductions
    (parallel/sharding.check_circular_paths_tiled /
    check_polygonal_paths_tiled). One chip = 1x1 mesh; --cpu-mesh 8 runs the
    full distributed path on the virtual CPU mesh."""
    import json

    import jax
    import jax.numpy as jnp

    from traversability_estimation_tpu.ops import footprint as fp_ops
    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.ops.veto import VetoConfig
    from traversability_estimation_tpu.parallel import sharding as sh

    ccfg = ChainConfig(resolution=res)
    vcfg = VetoConfig(resolution=res, check_roughness=False)
    mesh = sh.make_mesh()
    gx, gy = mesh.devices.shape
    print(f"tiled mode: mesh {gx}x{gy} ({mesh.devices.size} devices)", file=sys.stderr)

    padded, orig = sh.pad_to_mesh(elev, mesh)
    elev_dev = jax.device_put(
        jnp.asarray(padded),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("x", "y")),
    )
    t0 = time.time()
    layers = sh.sharded_update(elev_dev, ccfg, vcfg, mesh, orig_shape=orig)
    radius, offset = 0.3, 0.15
    field = sh.sharded_circle_field(
        layers, mesh, radius + offset, radius, res, 0.5, orig_shape=orig
    )
    jax.block_until_ready(field)
    print(f"sharded update + field: {time.time()-t0:.2f}s (incl. compile)",
          file=sys.stderr)

    if args.device_gen:
        run_tiled_device_gen(
            args, elev, res, mesh, ccfg, vcfg, elev_dev, layers, field, orig
        )
        return

    rng = np.random.default_rng(0)
    P, N = args.rollouts, args.poses
    # start at a traversable cell near the map center (field verdict plane)
    ok_host = np.asarray(jax.device_get(field[0]))[: orig[0], : orig[1]]
    ii, jj = np.nonzero(ok_host)
    if len(ii) == 0:
        print("no traversable cell on the map", file=sys.stderr)
        return
    ctr = np.array([orig[0] / 2, orig[1] / 2])
    k = int(np.argmin((ii - ctr[0]) ** 2 + (jj - ctr[1]) ** 2))
    half = np.array(orig) * res / 2.0
    robot = np.array(
        [half[0] - (ii[k] + 0.5) * res, half[1] - (jj[k] + 0.5) * res], np.float64
    )
    print(f"start at {robot}", file=sys.stderr)
    footprint = np.array(
        [[0.25, 0.15], [0.25, -0.15], [-0.25, -0.15], [-0.25, 0.15]], np.float32
    )
    window = fp_ops.polygon_window_cells(footprint, 0.3, res, False)
    budgets = []
    for step in range(args.steps):
        t_step = time.time()
        headings = rng.uniform(0, 2 * np.pi, P)
        base = np.stack([np.cos(headings), np.sin(headings)], -1) * 0.25
        steps_xy = base[:, None, :] + rng.uniform(-0.08, 0.08, (P, N - 1, 2))
        poses = np.concatenate(
            [np.broadcast_to(robot, (P, 1, 2)), robot + np.cumsum(steps_xy, 1)],
            axis=1,
        ).astype(np.float32)
        n_poses = np.full((P,), N, np.int32)
        safe, trav = sh.check_circular_paths_tiled(
            field[0], field[1], jnp.asarray(poses), jnp.asarray(n_poses),
            mesh, (0.0, 0.0), res, 16,
        )
        # polygonal verdicts for the best candidates (hull row spans against
        # the sharded prefix planes, exact psum assembly)
        K = min(1024, P)
        pos3 = np.concatenate([poses[:K], np.zeros((K, N, 1), np.float32)], -1)
        quats = np.zeros((K, N, 4), np.float32)
        quats[..., 3] = 1.0
        safe_p, trav_p, area_p = sh.check_polygonal_paths_tiled(
            {
                "traversability": layers["traversability"],
                "traversable_mask": layers["traversable_mask"],
            },
            jnp.asarray(pos3), jnp.asarray(quats), jnp.asarray(n_poses[:K]),
            tuple(map(tuple, footprint.tolist())),
            mesh, window, False, (0.0, 0.0), res, 0.5, orig_shape=orig,
        )
        jax.block_until_ready((safe, trav, safe_p))
        safe = np.asarray(safe)
        trav = np.asarray(trav)
        budget = time.time() - t_step
        budgets.append(budget)
        best = int(np.argmax(np.where(safe, trav, -1.0)))
        print(
            f"step {step}: {budget*1e3:7.1f} ms | circ safe {safe.sum():>6}/{P} "
            f"| poly safe {np.asarray(safe_p).sum():>5}/{K} | best {trav[best]:.3f}",
            file=sys.stderr,
        )
        if safe[best]:
            robot = poses[best, min(3, N - 1), :].astype(np.float64)

    steady = float(np.median(budgets[1:])) if len(budgets) > 1 else budgets[0]
    print(
        f"tiled replanning budget p50: {steady*1e3:.1f} ms -> "
        f"{args.rollouts * args.poses / steady / 1e6:.1f}M pose-checks/s"
    )
    if args.json:
        blob = {
            "kind": "rollouts_tiled",
            "mesh": [gx, gy],
            "backend": jax.devices()[0].platform,
            "map_cells": list(orig),
            "rollouts": P,
            "poses": N,
            "budget_p50_ms": round(steady * 1e3, 1),
            "pose_checks_per_s": round(P * N / steady, 1),
        }
        with open(args.json, "w") as f:
            f.write(json.dumps(blob) + "\n")


def run_tiled_device_gen(
    args, elev, res, mesh, ccfg, vcfg, elev_dev, layers, field, orig
):
    """Config 5's multi-chip shape, fully fused: ONE program per replanning
    step does submap merge into the ('x','y')-SHARDED elevation plane +
    tiled halo-exchange re-filter + per-tile circle field + device-generated
    rollouts scored via the psum-tiled evaluator + on-device argmax. The
    host uploads a 6 m patch and fetches ~100 bytes (best pose + counts) —
    the same zero-intermediate-sync discipline as the single-chip
    device-gen path (`PROF_BIGMAP.json`: every forced sync costs a full
    transport RTT). `--cpu-mesh 8` runs the identical program on the
    virtual mesh; a real slice runs it unchanged."""
    import functools
    import json

    import jax
    import jax.numpy as jnp

    from traversability_estimation_tpu.parallel import sharding as sh
    from traversability_estimation_tpu.utils.sources import (
        SyntheticTerrainSource,
    )

    P, N = args.rollouts, args.poses
    H, W = elev_dev.shape
    radius, offset = 0.3, 0.15
    max_cells = 16
    n_poses = jnp.full((P,), N, jnp.int32)
    gx, gy = mesh.devices.shape

    # start at a traversable cell near the map center
    ok_host = np.asarray(jax.device_get(field[0]))[: orig[0], : orig[1]]
    ii, jj = np.nonzero(ok_host)
    if len(ii) == 0:
        print("no traversable cell on the map", file=sys.stderr)
        return
    ctr = np.array([orig[0] / 2, orig[1] / 2])
    k = int(np.argmin((ii - ctr[0]) ** 2 + (jj - ctr[1]) ** 2))
    half = np.array(orig) * res / 2.0
    robot = np.array(
        [half[0] - (ii[k] + 0.5) * res, half[1] - (jj[k] + 0.5) * res],
        np.float64,
    )
    print(f"start at {robot}", file=sys.stderr)

    @functools.partial(jax.jit, static_argnames=())
    def step_fn(elevation, patch, merge_start, robot_xy, key):
        k1, k2 = jax.random.split(key)
        headings = jax.random.uniform(k1, (P,), minval=0.0, maxval=2 * np.pi)
        base = jnp.stack([jnp.cos(headings), jnp.sin(headings)], -1) * 0.25
        jitter = jax.random.uniform(
            k2, (P, N - 1, 2), minval=-0.08, maxval=0.08
        )
        poses = jnp.concatenate(
            [
                jnp.broadcast_to(robot_xy, (P, 1, 2)),
                robot_xy + jnp.cumsum(base[:, None, :] + jitter, axis=1),
            ],
            axis=1,
        ).astype(jnp.float32)
        elev2, _layers, safe, trav = sh.sharded_online_tick(
            elevation, patch, merge_start, poses, n_poses,
            mesh=mesh, chain_cfg=ccfg, veto_cfg=vcfg, radius=radius,
            offset=offset, resolution=res, max_segment_cells=max_cells,
            orig_shape=orig,
        )
        score = jnp.where(safe, trav, -1.0)
        best = jnp.argmax(score)
        return (
            elev2, poses[best], safe[best], trav[best],
            jnp.sum(safe.astype(jnp.int32)),
        )

    src = SyntheticTerrainSource(resolution=res)
    halo_guard = 0  # sharded_online_tick clamps via caller contract
    budgets = []
    for step in range(args.steps):
        t0 = time.time()
        patch, _ = src.sample(tuple(robot), (6.0, 6.0))
        ph, pw = patch.shape
        # patch top-left index on the padded sharded map (position (0,0)
        # center of the ORIGINAL map), clamped fully inside
        i0 = int(np.floor((half[0] - (robot[0] + ph * res / 2)) / res))
        j0 = int(np.floor((half[1] - (robot[1] + pw * res / 2)) / res))
        i0 = max(0, min(i0, H - ph))
        j0 = max(0, min(j0, W - pw))
        elev_dev, best_pose, best_safe, best_trav, n_safe = step_fn(
            elev_dev, jnp.asarray(patch),
            jnp.asarray([i0, j0], jnp.int32),
            jnp.asarray(robot, jnp.float32), jax.random.PRNGKey(step),
        )
        best_pose, best_safe, best_trav, n_safe = jax.device_get(
            (best_pose, best_safe, best_trav, n_safe)
        )
        budget = time.time() - t0
        budgets.append(budget)
        print(
            f"step {step}: {budget*1e3:7.1f} ms | safe {int(n_safe):>6}/{P} "
            f"| best {float(best_trav):.3f}",
            file=sys.stderr,
        )
        if bool(best_safe):
            robot = np.asarray(best_pose)[min(3, N - 1)].astype(np.float64)

    steady = float(np.median(budgets[1:])) if len(budgets) > 1 else budgets[0]
    print(
        f"tiled device-gen replanning budget p50: {steady*1e3:.1f} ms -> "
        f"{P * N / steady / 1e6:.1f}M pose-checks/s"
    )
    if args.json:
        blob = {
            "kind": "rollouts_tiled_device_gen",
            "mesh": [int(gx), int(gy)],
            "backend": jax.devices()[0].platform,
            "map_cells": list(orig),
            "rollouts": P,
            "poses": N,
            "budget_p50_ms": round(steady * 1e3, 1),
            "pose_checks_per_s": round(P * N / steady, 1),
        }
        with open(args.json, "a") as f:
            f.write(json.dumps(blob) + "\n")


def run_device_gen(args, est, src, robot, res):
    """Config 5, TPU-native shape: rollouts are GENERATED ON DEVICE.

    The round-3 rollout budget (689 ms p50 for 100k x 12) was dominated by
    the host side of the loop: ~8.8M numpy RNG samples per step plus a
    ~9.6 MB pose upload through the tunnel, then a 0.8 MB verdict download
    (decomposition: the --stages flag on the host-gen path). None of that
    is engine work. A planner on this stack generates its random-walk
    rollouts inside the scoring program (jax.random from a per-step key)
    and fetches back only the best pose + aggregates — the device sees a
    160 KB patch upload and returns ~100 bytes.

    Per step, ONE program: generate poses -> rasterize -> probe the cropped
    dense circle field -> aggregate -> argmax(best safe path). The map
    refresh (update_with_submap) and crop+field build stay the same
    estimator calls as the host-gen path.
    """
    import json

    import jax
    import jax.numpy as jnp

    from traversability_estimation_tpu.ops import footprint as fp_ops

    P, N = args.rollouts, args.poses
    radius, offset = 0.3, est.config.footprint.circular_footprint_offset
    reach = (0.25 + 0.08) * (N - 1) + 0.1
    max_cells = 16

    @jax.jit
    def score_step(state, field, robot_xy, key):
        k1, k2 = jax.random.split(key)
        headings = jax.random.uniform(k1, (P,), minval=0.0, maxval=2 * np.pi)
        base = jnp.stack([jnp.cos(headings), jnp.sin(headings)], -1) * 0.25
        jitter = jax.random.uniform(
            k2, (P, N - 1, 2), minval=-0.08, maxval=0.08
        )
        steps_xy = base[:, None, :] + jitter
        poses = jnp.concatenate(
            [
                jnp.broadcast_to(robot_xy, (P, 1, 2)),
                robot_xy + jnp.cumsum(steps_xy, axis=1),
            ],
            axis=1,
        ).astype(jnp.float32)
        n_poses = jnp.full((P,), N, jnp.int32)
        safe, trav = fp_ops.check_circular_paths(
            state, poses, n_poses, radius, offset, max_cells, field, False
        )
        score = jnp.where(safe, trav, -1.0)
        best = jnp.argmax(score)
        return (
            best,
            poses[best],
            safe[best],
            trav[best],
            jnp.sum(safe.astype(jnp.int32)),
        )

    budgets, stages = [], {"update": [], "field": [], "score": []}
    for step in range(args.steps):
        t_step = time.time()
        patch, _ = src.sample(tuple(robot), (6.0, 6.0))
        # everything below DISPATCHES asynchronously; the whole step pays
        # exactly ONE transport round-trip, at the final device_get.
        # (Round-4 decomposition, PROF_BIGMAP.json: with a sync after each
        # section the step spent 4 RTTs ~= 100 ms waiting on a ~25 ms-RTT
        # tunnel around ~15 ms of actual device work.)
        est.update_with_submap(patch, tuple(robot), sync=False)
        t1 = time.time()
        corners = np.array(
            [
                [robot[0] - reach, robot[1] - reach],
                [robot[0] + reach, robot[1] + reach],
            ],
            np.float32,
        )
        state, field = est._cropped_state_and_field(corners, radius, offset)
        t2 = time.time()
        best, best_poses, best_safe, best_trav, n_safe = jax.device_get(
            score_step(
                state, field, jnp.asarray(robot, jnp.float32),
                jax.random.PRNGKey(step),
            )
        )
        t3 = time.time()
        budgets.append(t3 - t_step)
        stages["update"].append(t1 - t_step)
        stages["field"].append(t2 - t1)
        stages["score"].append(t3 - t2)
        print(
            f"step {step}: {budgets[-1]*1e3:7.1f} ms "
            f"(dispatch: update {stages['update'][-1]*1e3:6.1f} | field "
            f"{stages['field'][-1]*1e3:6.1f} | gen+score+exec+fetch "
            f"{stages['score'][-1]*1e3:6.1f}) | safe {int(n_safe):>6}/{P} "
            f"| best {float(best_trav):.3f}",
            file=sys.stderr,
        )
        if bool(best_safe):
            robot = np.asarray(best_poses)[min(3, N - 1)].astype(np.float64)

    steady = float(np.median(budgets[1:])) if len(budgets) > 1 else budgets[0]
    med = {k: round(float(np.median(v[1:] if len(v) > 1 else v)) * 1e3, 1)
           for k, v in stages.items()}
    print(
        f"device-gen replanning budget p50: {steady*1e3:.1f} ms "
        f"(stages {med}) -> "
        f"{P * N / steady / 1e6:.1f}M pose-checks/s sustained"
    )
    if args.json:
        blob = {
            "kind": "rollouts_device_gen",
            "backend": jax.devices()[0].platform,
            "map_cells": list(est.query_state.shape),
            "rollouts": P,
            "poses": N,
            "budget_p50_ms": round(steady * 1e3, 1),
            "stage_p50_ms": med,
            "pose_checks_per_s": round(P * N / steady, 1),
        }
        with open(args.json, "a") as f:
            f.write(json.dumps(blob) + "\n")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--map-m", type=float, default=200.0)
    ap.add_argument("--res", type=float, default=0.03)
    ap.add_argument("--rollouts", type=int, default=100_000)
    ap.add_argument("--poses", type=int, default=12)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument(
        "--device-gen",
        action="store_true",
        help="generate rollouts ON DEVICE (jax.random) and fetch only the "
        "best pose + aggregates — removes the host RNG + 9.6 MB pose upload "
        "+ 0.8 MB verdict download from the replanning budget",
    )
    ap.add_argument(
        "--stages",
        action="store_true",
        help="decompose each host-gen replanning step into gen/upload/"
        "update/field/query/fetch stage timings (written to the JSON row)",
    )
    ap.add_argument(
        "--tiled",
        action="store_true",
        help="large-map mode: keep the map SHARDED over the device mesh "
        "(never replicated) and score rollouts with pmin/psum verdict "
        "reductions (parallel/sharding.check_*_paths_tiled). On one chip the "
        "mesh is 1x1; on the virtual 8-device CPU mesh this exercises the "
        "full config-5 distributed path. NOTE: the tiled field is computed "
        "over the whole PER-DEVICE tile, so the per-device tile must fit "
        "~100 plane temporaries in HBM — a 1x1 'mesh' at 200 m OOMs one "
        "v5e chip (measured 17.3/15.75 GB); use the default query-cropped "
        "mode on a single chip at that scale.",
    )
    ap.add_argument(
        "--cpu-mesh",
        type=int,
        default=0,
        help="force an n-device virtual CPU mesh (e.g. 8) for --tiled demos",
    )
    ap.add_argument("--json", default="", help="write a result JSON line here")
    args = ap.parse_args(argv)

    if args.cpu_mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
            ).strip()

    import jax
    import jax.numpy as jnp

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache"
                      if not args.cpu_mesh else "/root/repo/.jax_cache_cpu")
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

    if args.tiled:
        run_tiled(args, elev, res)
        return
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
    if args.device_gen:
        run_device_gen(args, est, src, robot, res)
        return
    budgets = []
    stage_names = ("update", "gen", "query_dispatch", "query_wait", "fetch")
    stage_t = {k: [] for k in stage_names}
    for step in range(args.steps):
        t_step = time.time()
        # refresh a 6 m window around the robot (sensor update)
        patch, _ = src.sample(tuple(robot), (6.0, 6.0))
        est.update_with_submap(patch, tuple(robot))
        if args.stages:
            np.asarray(est.traversability_map["traversability"][:1, :1])
        t1 = time.time()
        # rollouts: random-walk candidate paths from the robot
        headings = rng.uniform(0, 2 * np.pi, P)
        base = np.stack([np.cos(headings), np.sin(headings)], -1) * 0.25
        steps_xy = base[:, None, :] + rng.uniform(-0.08, 0.08, (P, N - 1, 2))
        poses = np.concatenate(
            [np.broadcast_to(robot, (P, 1, 2)), robot + np.cumsum(steps_xy, 1)],
            axis=1,
        ).astype(np.float32)
        t2 = time.time()
        # dispatch includes the pose upload + crop/field build
        safe, trav = est.check_circular_paths_batch(
            poses, np.full((P,), N, np.int32), 0.3
        )
        t3 = time.time()
        jax.block_until_ready((safe, trav))
        t4 = time.time()
        safe = np.asarray(safe)
        trav = np.asarray(trav)
        t5 = time.time()
        budget = t5 - t_step
        budgets.append(budget)
        for k, v in zip(
            stage_names, (t1 - t_step, t2 - t1, t3 - t2, t4 - t3, t5 - t4)
        ):
            stage_t[k].append(v)
        best = int(np.argmax(np.where(safe, trav, -1.0)))
        msg = (
            f"step {step}: {budget*1e3:7.1f} ms budget | safe {safe.sum():>6}/{P} "
            f"| best trav {trav[best]:.3f}"
        )
        if args.stages:
            msg += " | " + " ".join(
                f"{k} {stage_t[k][-1]*1e3:.1f}" for k in stage_names
            )
        print(msg, file=sys.stderr)
        if safe[best]:
            robot = poses[best, min(3, N - 1), :].astype(np.float64)

    steady = float(np.median(budgets[1:])) if len(budgets) > 1 else budgets[0]
    print(
        f"replanning budget p50: {steady*1e3:.1f} ms -> "
        f"{args.rollouts * args.poses / steady/1e6:.1f}M pose-checks/s sustained"
    )
    if args.json:
        import json

        blob = {
            "kind": "rollouts",
            "backend": jax.devices()[0].platform,
            "map_cells": [n, n],
            "rollouts": args.rollouts,
            "poses": args.poses,
            "budget_p50_ms": round(steady * 1e3, 1),
            "pose_checks_per_s": round(args.rollouts * args.poses / steady, 1),
        }
        if args.stages:
            blob["stage_p50_ms"] = {
                k: round(
                    float(np.median(v[1:] if len(v) > 1 else v)) * 1e3, 1
                )
                for k, v in stage_t.items()
            }
        with open(args.json, "a") as f:
            f.write(json.dumps(blob) + "\n")


if __name__ == "__main__":
    main()
