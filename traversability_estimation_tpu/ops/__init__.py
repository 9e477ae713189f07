from traversability_estimation_tpu.ops import filters  # noqa: F401
