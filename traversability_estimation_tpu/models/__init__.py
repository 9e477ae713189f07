from traversability_estimation_tpu.models.estimator import (
    FootprintPath,
    TraversabilityEstimator,
    TraversabilityResult,
)

__all__ = ["TraversabilityEstimator", "FootprintPath", "TraversabilityResult"]
