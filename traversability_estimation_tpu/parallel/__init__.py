from traversability_estimation_tpu.parallel.sharding import (
    make_mesh,
    required_halo,
    sharded_update,
    replicate_query_state,
)

__all__ = ["make_mesh", "required_halo", "sharded_update", "replicate_query_state"]
