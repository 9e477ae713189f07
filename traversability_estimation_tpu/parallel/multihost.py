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
):
    """Wire up the JAX distributed runtime (no-op when already initialized or
    when running single-process). Args map 1:1 to jax.distributed.initialize;
    under TPU pod runtimes all three are auto-detected and may be None."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise
    return make_mesh()
