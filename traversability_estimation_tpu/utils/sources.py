"""Elevation input sources — the upstream side of the reference's pipeline.

The reference pulls robot-centric submaps from an external elevation_mapping
node over a ROS service (requestElevationMap,
/root/reference/traversability_estimation/src/TraversabilityEstimation.cpp:248-270)
on a timer. Here a source is just a callable host object producing
``(elevation_patch, center_position)``; the estimator's online loop merges
patches into the persistent map and re-runs the device update.

Provided sources:
- SyntheticTerrainSource: procedural rolling terrain with steps/holes, sampled
  in any robot-centric window (deterministic; useful for benches and the
  online-loop demo).
- ArraySource: serves windows of a fixed global elevation array (e.g. loaded
  from a golden bag) — the stand-in for a real mapping node.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np


@dataclasses.dataclass
class SyntheticTerrainSource:
    resolution: float = 0.03
    seed: int = 0
    noise: float = 0.012
    hole_frac: float = 0.01

    def sample(self, center_xy, length_xy) -> Tuple[np.ndarray, np.ndarray]:
        """Sample a (rows, cols) window centered at `center_xy` covering
        `length_xy` meters. Terrain is a fixed deterministic function of the
        world position, so overlapping windows agree."""
        res = self.resolution
        rows = int(round(length_xy[0] / res))
        cols = int(round(length_xy[1] / res))
        # cell centers in world frame, grid_map convention
        cx, cy = float(center_xy[0]), float(center_xy[1])
        x = cx + rows * res / 2 - 0.5 * res - np.arange(rows) * res
        y = cy + cols * res / 2 - 0.5 * res - np.arange(cols) * res
        X = np.broadcast_to(x[:, None], (rows, cols))
        Y = np.broadcast_to(y[None, :], (rows, cols))
        z = (
            0.15 * np.sin(0.7 * X) * np.cos(0.5 * Y)
            + 0.3 * ((np.sin(0.21 * X + 1.0) > 0.85) & (np.cos(0.17 * Y) > 0.4))
        )
        # deterministic per-cell noise/holes from integer world cell ids.
        # floor, not round: cell centers sit at half-integer multiples of res,
        # so round() would tie-break inconsistently between windows
        gi = np.floor(X / res).astype(np.int64)
        gj = np.floor(Y / res).astype(np.int64)
        h = (gi * 2654435761 + gj * 40503) & 0xFFFFFFFF
        u = (h.astype(np.float64) / 2**32)
        z = z + self.noise * (2.0 * u - 1.0)
        z = np.where(((h >> 8) & 0xFFFF) / 65536.0 < self.hole_frac, np.nan, z)
        return z.astype(np.float32), np.asarray([cx, cy], np.float32)


@dataclasses.dataclass
class ArraySource:
    """Windows over a fixed global array (world position of the array center
    at `position`)."""

    elevation: np.ndarray
    resolution: float
    position: Tuple[float, float] = (0.0, 0.0)

    def sample(self, center_xy, length_xy) -> Tuple[np.ndarray, np.ndarray]:
        res = self.resolution
        rows = int(round(length_xy[0] / res))
        cols = int(round(length_xy[1] / res))
        H, W = self.elevation.shape
        half = np.array([H, W]) * res / 2.0
        # index of the requested window's top-left cell in the global array
        i0 = int(np.floor((self.position[0] + half[0] - (center_xy[0] + rows * res / 2)) / res))
        j0 = int(np.floor((self.position[1] + half[1] - (center_xy[1] + cols * res / 2)) / res))
        out = np.full((rows, cols), np.nan, np.float32)
        si0, sj0 = max(i0, 0), max(j0, 0)
        si1, sj1 = min(i0 + rows, H), min(j0 + cols, W)
        if si1 > si0 and sj1 > sj0:
            out[si0 - i0 : si1 - i0, sj0 - j0 : sj1 - j0] = self.elevation[
                si0:si1, sj0:sj1
            ]
        return out, np.asarray(center_xy, np.float32)
