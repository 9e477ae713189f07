"""Decompose the tiled-query cost across mesh sizes (VERDICT r3 weak #4).

Round 3's virtual-CPU-mesh table showed tiled-query throughput FALLING 12x
as devices grew 1 -> 8, dismissed as "not predictive of ICI" with no
profile. This script times the query's phases separately at each mesh size
so the collapse is attributable:

  raster      pose-batch Bresenham expansion + subsample (the arithmetic)
              - replicated (round-3 behavior) vs sharded over the pose axis
  psum_only   a shard_map that ONLY does the probe phase's three psums on
              correctly-shaped arrays — the pure collective floor
  probe       owner-tile gather + psums on precomputed sample cells
  full        parallel.sharding.check_circular_paths_tiled end to end

On the virtual CPU mesh the mesh-N "devices" share one socket, so compute
phases cannot speed up with N — but the phase decomposition still separates
"replicated work grows with N" from "collective infrastructure grows with
N", which is the question round 3 left open. The same script runs unchanged
on a real slice.

Usage: JAX_PLATFORMS=cpu python scripts/profile_tiled.py [--sizes 1 2 4 8]
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--paths", type=int, default=256)
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--max-cells", type=int, default=16)
    ap.add_argument("--cpu", action="store_true", default=None)
    ap.add_argument("--k1", type=int, default=4)
    ap.add_argument("--k2", type=int, default=12)
    args = ap.parse_args(argv)

    if args.cpu is None:
        args.cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={max(args.sizes)}"
            ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(_REPO, ".jax_cache_cpu" if args.cpu else ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from traversability_estimation_tpu.grid.geometry import line_cells_batch
    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.ops.veto import VetoConfig
    from traversability_estimation_tpu.parallel import sharding as sh
    from traversability_estimation_tpu.utils.profiling import adaptive_slope

    devices = jax.devices()
    log(f"backend: {devices[0].platform}, {len(devices)} device(s)")
    res = 0.03
    ccfg = ChainConfig(resolution=res)
    vcfg = VetoConfig(resolution=res)
    rng = np.random.default_rng(0)
    Pn, N, MC = args.paths, args.poses, args.max_cells
    S = (MC + 3) // 4

    def slope(make_loop, arg):
        return adaptive_slope(
            make_loop, arg, args.k1, args.k2, 2e-3, max_escalations=4, log=log
        )

    for n in [s for s in args.sizes if s <= len(devices)]:
        mesh = sh.make_mesh(devices=devices[:n])
        gx, gy = mesh.devices.shape
        H, W = args.tile * gx, args.tile * gy
        elev = (0.05 * rng.standard_normal((H, W))).astype(np.float32)
        elev_dev = jax.device_put(
            jnp.asarray(elev), NamedSharding(mesh, P("x", "y"))
        )
        layers = sh.sharded_update(elev_dev, ccfg, vcfg, mesh)
        field = sh.sharded_circle_field(layers, mesh, 0.45, 0.3, res)
        extent = H * res / 2 * 0.7
        starts = np.stack(
            [rng.uniform(-extent, extent, Pn), rng.uniform(-extent, extent, Pn)],
            -1,
        )
        steps = rng.uniform(-0.06, 0.06, (Pn, N - 1, 2))
        poses = np.concatenate(
            [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
        ).astype(np.float32)
        poses_dev = jnp.asarray(poses)
        n_poses = jnp.full((Pn,), N, jnp.int32)

        row = {"kind": "profile_tiled", "backend": devices[0].platform,
               "mesh": n, "grid": [gx, gy], "paths": Pn, "poses": N}

        # --- raster replicated (round-3 behavior): plain jit, every device
        # computes the full batch (on 1 process this measures the arithmetic
        # once; on a mesh it is what each device used to pay)
        p0 = jnp.asarray([H, W], jnp.float32) * res * 0.5

        def raster(poses_a):
            st = poses_a[:, : N - 1, :]
            en = poses_a[:, 1:, :]
            si = jnp.floor((p0 - st) / res).astype(jnp.int32)
            ei = jnp.floor((p0 - en) / res).astype(jnp.int32)
            cells, valid, _ = line_cells_batch(ei, si, MC)
            ids = jnp.arange(S) * 4
            return cells[..., ids, :], valid[..., ids]

        def make_raster_loop(k):
            @jax.jit
            def loop(p):
                def body(c, _):
                    sc, sv = raster(c)
                    return c + 1e-9 * sc[0, 0, 0, 0].astype(jnp.float32), None

                c, _ = jax.lax.scan(body, p, None, length=k)
                return c[0, 0, 0]

            return loop

        row["t_raster_replicated_ms"] = round(
            slope(make_raster_loop, poses_dev) * 1e3, 4
        )

        # --- psum-only floor: three psums of probe-phase-shaped arrays
        ones_f = jnp.ones((Pn, N - 1, S), jnp.float32)

        def make_psum_loop(k):
            def psbody(a):
                x = jax.lax.psum(a, ("x", "y"))
                y = jax.lax.psum(a + 1.0, ("x", "y"))
                z = jax.lax.psum(a + 2.0, ("x", "y"))
                return x + y + z

            ps = jax.shard_map(
                psbody, mesh=mesh, in_specs=P(), out_specs=P(),
                check_vma=False,
            )

            @jax.jit
            def loop(a):
                def body(c, _):
                    return c + 1e-9 * ps(c), None

                c, _ = jax.lax.scan(body, a, None, length=k)
                return c[0, 0, 0]

            return loop

        row["t_psum_only_ms"] = round(slope(make_psum_loop, ones_f) * 1e3, 4)

        # --- full query
        def make_full_loop(k):
            @jax.jit
            def loop(p):
                def body(c, _):
                    safe, trav = sh.check_circular_paths_tiled(
                        field[0], field[1], c, n_poses, mesh, (0.0, 0.0),
                        res, MC,
                    )
                    return c + 1e-9 * trav[:, None, None], None

                c, _ = jax.lax.scan(body, p, None, length=k)
                return c[0, 0, 0]

            return loop

        row["t_full_ms"] = round(slope(make_full_loop, poses_dev) * 1e3, 4)
        row["checks_per_s"] = round(Pn * N / (row["t_full_ms"] / 1e3), 1)

        # comparison: the round-3 behavior (replicated rasterization) —
        # an odd path count falls back to the unsharded raster path
        Pr = Pn - 1
        poses_odd = jnp.asarray(poses[:Pr])
        n_poses_odd = jnp.full((Pr,), N, jnp.int32)

        def make_full_rep_loop(k):
            @jax.jit
            def loop(p):
                def body(c, _):
                    safe, trav = sh.check_circular_paths_tiled(
                        field[0], field[1], c, n_poses_odd, mesh,
                        (0.0, 0.0), res, MC,
                    )
                    return c + 1e-9 * trav[:, None, None], None

                c, _ = jax.lax.scan(body, p, None, length=k)
                return c[0, 0, 0]

            return loop

        t_rep = slope(make_full_rep_loop, poses_odd)
        row["t_full_replicated_raster_ms"] = round(t_rep * 1e3 * Pn / Pr, 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
