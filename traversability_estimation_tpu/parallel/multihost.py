"""Multi-host (DCN) entry points.

The reference's only inter-process story is ROS TCPROS services
(SURVEY.md §2.3). Here, scaling past one host is the standard JAX
single-controller-per-host pattern: ``jax.distributed.initialize`` links the
hosts, the global 2-D mesh spans every chip, and the same ``shard_map`` update
from ``parallel.sharding`` runs unchanged — halo exchanges between tiles on
the same host ride ICI, cross-host edges ride DCN. Keep the mesh's "x" axis
host-major (the default device order) so only one tile edge per host pair
crosses DCN.
"""

from __future__ import annotations

import jax

from traversability_estimation_tpu.parallel.sharding import make_mesh


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_cpu_devices: int | None = None,
):
    """Wire up the JAX distributed runtime (no-op when already initialized or
    when running single-process). Args map 1:1 to jax.distributed.initialize;
    under TPU pod runtimes the first three are auto-detected and may be None.

    On the CPU backend (the no-cluster test rig), cross-process collectives
    need the gloo implementation AND ``jax_num_cpu_devices`` (the XLA_FLAGS
    fake-device count does NOT compose with the distributed client) selected
    BEFORE backend init — both handled here; pass ``local_cpu_devices`` for
    the per-process virtual chip count."""
    import os

    platforms = (
        getattr(jax.config, "jax_platforms", None)
        or os.environ.get("JAX_PLATFORMS", "")
    )
    # decide from config/env only — calling jax.default_backend() here would
    # initialize the backend before the flags take effect. Applies whenever
    # the caller asked for virtual CPU devices — including num_processes == 1
    # (the scaling-efficiency denominator run): host sitecustomize setups can
    # force-register accelerator plugins over JAX_PLATFORMS, and a 1-host
    # "CPU" run silently landing on an accelerator poisons the comparison.
    if "tpu" not in platforms and (
        local_cpu_devices or (num_processes is not None and num_processes > 1)
    ):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
            if local_cpu_devices:
                # pin the platform via config too (see note above)
                jax.config.update("jax_platforms", "cpu")
                jax.config.update("jax_num_cpu_devices", int(local_cpu_devices))
        except Exception:  # noqa: BLE001 — older jax: flag absent, mpi-only
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise
    if num_processes is not None and jax.process_count() != num_processes:
        raise RuntimeError(
            f"distributed init failed: expected {num_processes} processes, "
            f"got {jax.process_count()}"
        )
    return make_mesh()
