"""TPU-native traversability estimation engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``leggedrobotics/traversability_estimation`` (reference: ROS/C++ grid_map filter
chain + footprint path checking; see /root/reference). This package is NOT a
port: elevation maps are dense device arrays, the filter chain is one fused
stencil pass, footprint/path queries are batched vectorized evaluators, and
scaling is SPMD over a ``jax.sharding.Mesh`` instead of ROS services/threads.

Layout
------
- ``grid``     : GridMap pytree + grid_map-parity geometry (index math, circle/
                 polygon/line/spiral semantics as masks & static orderings).
- ``ops``      : device compute — the filter chain (normals/slope/step/
                 roughness/fusion), dense veto fields, batched footprint
                 evaluators, convex hull, Pallas kernels.
- ``models``   : the traversability pipeline ("model"): declarative filter
                 chain spec -> jitted composite, and the estimator orchestrator
                 (the API surface that replaces the reference's ROS node).
- ``parallel`` : mesh sharding — tiled map updates with halo exchange, pose-
                 batch sharded footprint evaluation, multi-host entry points.
- ``utils``    : config (reference-YAML compatible), rosbag reader AND writer
                 (checkpoint parity), snapshots, synthetic terrain, profiling,
                 visualization exports (occupancy grid / point cloud).
- ``oracle``   : NumPy reference oracle with the exact semantics of the C++
                 implementation; the referee for every kernel test.
- ``node``     : process-level orchestrator (timer loop, latched publication,
                 pushed inputs) — the ROS-node analog.
- ``service``  : JSON-lines TCP front end + client exposing the reference's
                 seven services for out-of-process planners.

CLI: ``python -m traversability_estimation_tpu run|serve``.
"""

from traversability_estimation_tpu.grid.gridmap import GridMap

__version__ = "0.1.0"

__all__ = ["GridMap", "__version__"]
