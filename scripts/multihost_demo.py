"""Multi-host sharded update demo (BASELINE.json config 5 scaffolding).

Run one process per host, e.g. locally with two CPU processes (gloo
cross-process collectives, 4 virtual chips each):

  JAX_PLATFORMS=cpu python scripts/multihost_demo.py \
      --num-processes 2 --process-id 0 --local-devices 4 &
  JAX_PLATFORMS=cpu python scripts/multihost_demo.py \
      --num-processes 2 --process-id 1 --local-devices 4

On a TPU pod all three arguments are auto-detected and may be omitted.
The global mesh spans every chip on every host; the same sharded_update /
pose-batch code from parallel/ runs unchanged, with cross-host tile edges on
DCN.
"""

from __future__ import annotations

import argparse
import os
import sys

# self-bootstrap: run from a fresh checkout without installing the package.
# APPEND (never overwrite PYTHONPATH / prepend): this host's TPU plugin lives
# on PYTHONPATH and must keep winning import resolution.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.append(_REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="localhost:12321")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--map-cells", type=int, default=512)
    ap.add_argument("--local-devices", type=int, default=None,
                    help="virtual CPU chips per process (CPU rig only)")
    args = ap.parse_args()

    import jax

    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.ops.veto import VetoConfig
    from traversability_estimation_tpu.ops import footprint as fp_ops
    from traversability_estimation_tpu.parallel import sharding as sh
    from traversability_estimation_tpu.parallel.multihost import initialize_multihost

    mesh = initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        local_cpu_devices=args.local_devices,
    )
    print(
        f"process {jax.process_index()}/{jax.process_count()}: mesh {mesh.devices.shape}"
    )

    res = 0.03
    ccfg = ChainConfig(resolution=res)
    vcfg = VetoConfig(resolution=res, check_roughness=True)

    rng = np.random.default_rng(0)
    n = args.map_cells
    elev = (0.05 * rng.standard_normal((n, n))).astype(np.float32)
    padded, orig = sh.pad_to_mesh(elev, mesh)

    import jax.numpy as jnp

    layers = sh.sharded_update(jnp.asarray(padded), ccfg, vcfg, mesh, None, orig)
    state = sh.replicate_query_state(layers, mesh, (0.0, 0.0), res)

    P, N = 64 * len(jax.devices()), 8
    starts = rng.uniform(-2, 2, (P, 2))
    steps = rng.uniform(-0.1, 0.1, (P, N - 1, 2))
    poses = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    ).astype(np.float32)
    sharded_poses = sh.shard_pose_batch(jnp.asarray(poses), mesh)
    safe, trav = jax.jit(fp_ops.check_circular_paths, static_argnums=(3, 4, 5))(
        state, sharded_poses, jnp.full((P,), N, jnp.int32), 0.3, 0.15, 16
    )
    # results span processes: gather before host inspection
    from jax.experimental import multihost_utils

    safe_g = np.asarray(multihost_utils.process_allgather(safe, tiled=True))
    trav_g = np.asarray(multihost_utils.process_allgather(trav, tiled=True))
    mean = float(trav_g[safe_g].mean()) if safe_g.any() else float("nan")
    print(
        f"process {jax.process_index()}: {P} paths checked, "
        f"safe={int(safe_g.sum())}, mean trav={mean:.3f}"
    )


if __name__ == "__main__":
    main()
