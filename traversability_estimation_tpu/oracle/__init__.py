from traversability_estimation_tpu.oracle import filters  # noqa: F401
