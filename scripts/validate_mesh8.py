"""Config-5 virtual-mesh validation at REAL batch size (VERDICT r4 task #7).

The 13.5 ms (now ~11 ms) mesh-8 projection for config-5 replanning leans on
"update/field/score divide by 8" with the sharded-raster path engaged and
the verdict psum behaving as modeled. Round 4 only ever timed the tiled
program at 2048 rollouts on the CPU mesh; this script runs the REAL batch
(100k x 12 over the 200 m / 6667^2 map) on the 8-device virtual CPU mesh
and decomposes it the way scripts/profile_tiled.py does:

  update    sharded_update (halo-exchange re-filter) over the full map
  field     sharded_circle_field per tile
  score     check_circular_paths_tiled at 100k x 12 x 16 cells — engages
            BOTH round-5 large-batch paths: the sharded Bresenham raster
            (pose axis) and the per-PATH partial psum (samples -> paths
            inside the shard_map body)
  raster    the sharded rasterization alone (is the score raster-bound?)
  psum      a shard_map doing ONLY the (P, 4) per-path psum — the
            collective floor the comm model prices (~1.6 MB vs the
            round-4 per-sample planes' ~100 MB)

CPU-mesh absolute times are NOT chip predictions (XLA:CPU, one socket);
what this validates is the SHAPE: score >> raster-implied-collectives,
psum floor tiny vs score, program compiles + runs at full scale.

Usage: python scripts/validate_mesh8.py [--rollouts 100000] [--map-m 200]
Writes one JSON line per stage to --json (default ROLLOUTS_MESH8.json).
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--rollouts", type=int, default=100_000)
    ap.add_argument("--poses", type=int, default=12)
    ap.add_argument("--map-m", type=float, default=200.0)
    ap.add_argument("--res", type=float, default=0.03)
    ap.add_argument("--mesh", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", default=os.path.join(_REPO, "ROLLOUTS_MESH8.json"))
    args = ap.parse_args(argv)

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.mesh}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache_cpu")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.ops.veto import VetoConfig
    from traversability_estimation_tpu.parallel import sharding as sh
    from traversability_estimation_tpu.utils.sources import SyntheticTerrainSource

    assert len(jax.devices()) == args.mesh, jax.devices()
    res = args.res
    n_cells = int(round(args.map_m / res))
    ccfg = ChainConfig(resolution=res)
    vcfg = VetoConfig(resolution=res, check_roughness=False)
    mesh = sh.make_mesh()
    gx, gy = mesh.devices.shape
    log(f"mesh {gx}x{gy}, map {n_cells}^2 = {n_cells*n_cells/1e6:.0f}M cells")

    src = SyntheticTerrainSource(resolution=res)
    elev, _ = src.sample((0.0, 0.0), (args.map_m, args.map_m))
    elev = elev[:n_cells, :n_cells]
    padded, orig = sh.pad_to_mesh(elev, mesh)
    elev_dev = jax.device_put(
        jnp.asarray(padded),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("x", "y")),
    )
    del elev, padded

    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    def timed(name, fn, *a, **kw):
        out = fn(*a, **kw)
        jax.block_until_ready(out)  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.time()
            out = fn(*a, **kw)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        ts.sort()
        emit({
            "kind": "mesh8_stage", "stage": name, "mesh": args.mesh,
            "map_cells": list(orig), "rollouts": args.rollouts,
            "poses": args.poses,
            "t_med_ms": round(ts[len(ts) // 2] * 1e3, 1),
            "t_lo_ms": round(ts[0] * 1e3, 1),
            "t_hi_ms": round(ts[-1] * 1e3, 1),
            "n": args.reps,
        })
        return out

    radius, offset, max_cells = 0.3, 0.15, 16
    layers = timed(
        "update", sh.sharded_update, elev_dev, ccfg, vcfg, mesh,
        orig_shape=orig,
    )
    field = timed(
        "field", sh.sharded_circle_field, layers, mesh, radius + offset,
        radius, res, 0.5, orig_shape=orig,
    )

    P, N = args.rollouts, args.poses
    rng = np.random.default_rng(0)
    half = np.array(orig) * res / 2.0
    robot = np.zeros(2)
    headings = rng.uniform(0, 2 * np.pi, P)
    base = np.stack([np.cos(headings), np.sin(headings)], -1) * 0.25
    steps_xy = base[:, None, :] + rng.uniform(-0.08, 0.08, (P, N - 1, 2))
    poses = np.concatenate(
        [np.broadcast_to(robot, (P, 1, 2)), robot + np.cumsum(steps_xy, 1)],
        axis=1,
    ).astype(np.float32)
    poses_dev = jax.device_put(
        jnp.asarray(poses), jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(("x", "y"))
        ),
    )
    n_poses = jnp.full((P,), N, jnp.int32)

    samples = P * (N - 1) * ((max_cells + 3) // 4)
    raster_work = P * (N - 1) * max_cells
    emit({
        "kind": "mesh8_config", "samples": samples,
        "raster_work": raster_work,
        "sharded_raster_engaged": bool(raster_work >= (1 << 18)),
        "path_reduce_engaged": bool(samples >= sh._PATH_REDUCE_SAMPLES),
        "path_psum_bytes": 4 * P * 4,
        "per_sample_psum_bytes_would_be": 2 * samples * 4,
    })

    safe, trav = timed(
        "score", sh.check_circular_paths_tiled, field[0], field[1],
        poses_dev, n_poses, mesh, (0.0, 0.0), res, max_cells,
    )
    emit({
        "kind": "mesh8_sanity", "n_safe": int(np.asarray(safe).sum()),
        "rollouts": P,
    })

    # raster-only: the sharded Bresenham expansion + subsample all-gather
    from traversability_estimation_tpu.grid.geometry import line_cells_batch

    p0 = jnp.asarray([0.0, 0.0], jnp.float32) + jnp.asarray(
        [orig[0], orig[1]], jnp.float32
    ) * res * 0.5

    def _raster_only(poses_s, n_poses_s):
        Pl = poses_s.shape[0]  # per-device shard of the pose axis
        starts = poses_s[:, : N - 1, :]
        ends = poses_s[:, 1:, :]
        i0 = jnp.floor((p0 - ends.reshape(-1, 2)) / res).astype(jnp.int32)
        i1 = jnp.floor((p0 - starts.reshape(-1, 2)) / res).astype(jnp.int32)
        cells, valid, _ = line_cells_batch(
            i0.reshape(Pl, N - 1, 2), i1.reshape(Pl, N - 1, 2), max_cells
        )
        return cells[..., ::4, :]

    raster_sharded = jax.jit(
        jax.shard_map(
            _raster_only, mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(("x", "y")),) * 2,
            out_specs=jax.sharding.PartitionSpec(("x", "y")),
            check_vma=False,
        )
    )
    timed("raster_only", raster_sharded, poses_dev,
          jax.device_put(n_poses, jax.sharding.NamedSharding(
              mesh, jax.sharding.PartitionSpec(("x", "y")))))

    # psum floor: ONLY the (P, 4) per-path partial all-reduce
    def _psum_only(x):
        return jax.lax.psum(x, ("x", "y"))

    psum_fn = jax.jit(
        jax.shard_map(
            _psum_only, mesh=mesh,
            in_specs=jax.sharding.PartitionSpec(),
            out_specs=jax.sharding.PartitionSpec(),
            check_vma=False,
        )
    )
    buf = jnp.zeros((P, 4), jnp.float32)
    timed("psum_path_buffer_only", psum_fn, buf)

    with open(args.json, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    log(f"wrote {args.json} ({len(rows)} rows)")


if __name__ == "__main__":
    main()
