from traversability_estimation_tpu.grid.gridmap import GridMap
from traversability_estimation_tpu.grid import geometry

__all__ = ["GridMap", "geometry"]
