"""GridMap: the core multi-layer grid data model as a JAX pytree.

Capability-parity rebuild of ``grid_map::GridMap`` (external dependency of the
reference, used everywhere in
/root/reference/traversability_estimation/src/TraversabilityMap.cpp). Instead
of an Eigen circular-buffer grid with per-cell iterators, layers are dense
``(rows, cols)`` float32 device arrays and the map is an immutable pytree, so
it jits, vmaps, shards, and snapshots for free.

Geometry conventions follow grid_map exactly (required for golden parity):

- ``size = (rows, cols)``; row index runs along the map-frame x axis, column
  index along y. Index (0, 0) is the corner with the LARGEST x and y.
- cell center: ``pos(i) = position + 0.5*length - 0.5*res - i*res`` per axis.
- position -> index: ``i = floor((position + 0.5*length - pos) / res)``.
- a position is inside the map iff ``pos in (position - L/2, position + L/2]``
  per axis (upper edge inclusive, lower exclusive).

The reference's circular-buffer ``startIndex`` optimization for moving maps is
deliberately not carried over: recentring is a cheap roll/pad on device and a
zero start index keeps every kernel's indexing static. Layers absent from a
cell are NaN ("unknown"), same as grid_map.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GridMap:
    """Immutable multi-layer grid map.

    Attributes:
      layers: dict of layer name -> (rows, cols) float32 array. NaN = no data.
      resolution: cell edge length [m] (static).
      position: (2,) array — map-frame position of the grid center (dynamic).
      frame_id: coordinate frame name (static metadata).
      basic_layers: layers that define cell validity (static metadata);
        mirrors grid_map's basic-layers concept used by ``isValid``.
    """

    layers: Dict[str, jnp.ndarray]
    resolution: float
    position: jnp.ndarray
    frame_id: str = "map"
    basic_layers: Tuple[str, ...] = ()

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        names = tuple(sorted(self.layers.keys()))
        children = tuple(self.layers[n] for n in names) + (self.position,)
        aux = (names, self.resolution, self.frame_id, self.basic_layers)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        names, resolution, frame_id, basic_layers = aux
        layers = dict(zip(names, children[: len(names)]))
        position = children[len(names)]
        return cls(
            layers=layers,
            resolution=resolution,
            position=position,
            frame_id=frame_id,
            basic_layers=basic_layers,
        )

    # -- constructors ------------------------------------------------------
    @classmethod
    def create(
        cls,
        size: Tuple[int, int],
        resolution: float,
        position=(0.0, 0.0),
        layers: Iterable[str] = (),
        frame_id: str = "map",
        data: Optional[Mapping[str, np.ndarray]] = None,
    ) -> "GridMap":
        rows, cols = int(size[0]), int(size[1])
        layer_dict: Dict[str, jnp.ndarray] = {}
        for name in layers:
            layer_dict[name] = jnp.full((rows, cols), jnp.nan, dtype=jnp.float32)
        if data:
            for name, arr in data.items():
                arr = jnp.asarray(arr, dtype=jnp.float32)
                if arr.shape != (rows, cols):
                    raise ValueError(
                        f"layer {name!r} has shape {arr.shape}, expected {(rows, cols)}"
                    )
                layer_dict[name] = arr
        return cls(
            layers=layer_dict,
            resolution=float(resolution),
            position=jnp.asarray(position, dtype=jnp.float32),
            frame_id=frame_id,
        )

    @classmethod
    def from_length(
        cls,
        length: Tuple[float, float],
        resolution: float,
        position=(0.0, 0.0),
        layers: Iterable[str] = (),
        frame_id: str = "map",
    ) -> "GridMap":
        """Mirror grid_map's setGeometry: size = ceil(length/res - small eps)."""
        rows = int(round(length[0] / resolution))
        cols = int(round(length[1] / resolution))
        return cls.create((rows, cols), resolution, position, layers, frame_id)

    # -- basic properties --------------------------------------------------
    @property
    def size(self) -> Tuple[int, int]:
        for arr in self.layers.values():
            return tuple(arr.shape)
        raise ValueError("GridMap has no layers")

    @property
    def rows(self) -> int:
        return self.size[0]

    @property
    def cols(self) -> int:
        return self.size[1]

    @property
    def length(self) -> Tuple[float, float]:
        r, c = self.size
        return (r * self.resolution, c * self.resolution)

    def exists(self, layer: str) -> bool:
        return layer in self.layers

    def get(self, layer: str) -> jnp.ndarray:
        return self.layers[layer]

    def __getitem__(self, layer: str) -> jnp.ndarray:
        return self.layers[layer]

    # -- functional updates ------------------------------------------------
    def add(self, layer: str, data=None) -> "GridMap":
        """Return a new map with `layer` set (NaN-filled if data is None).

        Parity: grid_map's ``add`` overwrites an existing layer
        (reference filters call ``mapOut.add(type_)`` unconditionally).
        """
        rows, cols = self.size
        if data is None:
            arr = jnp.full((rows, cols), jnp.nan, dtype=jnp.float32)
        else:
            arr = jnp.asarray(data, dtype=jnp.float32).reshape(rows, cols)
        new_layers = dict(self.layers)
        new_layers[layer] = arr
        return dataclasses.replace(self, layers=new_layers)

    def add_all(self, updates: Mapping[str, jnp.ndarray]) -> "GridMap":
        new_layers = dict(self.layers)
        rows, cols = self.size
        for name, arr in updates.items():
            new_layers[name] = jnp.asarray(arr, dtype=jnp.float32).reshape(rows, cols)
        return dataclasses.replace(self, layers=new_layers)

    def erase(self, layer: str) -> "GridMap":
        new_layers = {k: v for k, v in self.layers.items() if k != layer}
        return dataclasses.replace(self, layers=new_layers)

    def keep_only(self, names: Iterable[str]) -> "GridMap":
        keep = set(names)
        new_layers = {k: v for k, v in self.layers.items() if k in keep}
        return dataclasses.replace(self, layers=new_layers)

    def clear(self, layer: str) -> "GridMap":
        """NaN-fill one layer (grid_map ``clear``)."""
        rows, cols = self.size
        return self.add(layer, jnp.full((rows, cols), jnp.nan, jnp.float32))

    @staticmethod
    def roll_valid_mask(rows: int, cols: int, si, sj):
        """(rows, cols) bool: cells that survive a window roll by (si, sj)
        — False marks cells exposed from outside the old window. jit-safe
        with traced shifts."""
        ri = jnp.arange(rows, dtype=jnp.int32)[:, None]
        rj = jnp.arange(cols, dtype=jnp.int32)[None, :]
        return (
            (ri - si >= 0) & (ri - si < rows)
            & (rj - sj >= 0) & (rj - sj < cols)
        )

    @staticmethod
    def roll_layer(a, si, sj, valid):
        """The grid_map ``move()`` primitive for ONE layer (jit-safe,
        traced shifts): roll by (si, sj); exposed cells take the per-dtype
        "unknown" fill — NaN for floats (grid_map parity), True for bool
        veto masks (unknown terrain passes, NaN != 0 comparisons in
        ops/veto.py), 0 otherwise. The ONLY implementation of this fill
        policy — ``GridMap.recenter`` and the fused online tick
        (models/estimator._online_tick_jit) both call it, so fused/unfused
        roaming equivalence holds by construction."""
        rolled = jnp.roll(a, (si, sj), axis=(0, 1))
        if jnp.issubdtype(a.dtype, jnp.floating):
            fill = jnp.array(jnp.nan, a.dtype)
        elif a.dtype == jnp.bool_:
            fill = jnp.array(True)
        else:
            fill = jnp.array(0, a.dtype)
        return jnp.where(valid, rolled, fill)

    def with_position(self, position) -> "GridMap":
        return dataclasses.replace(
            self, position=jnp.asarray(position, dtype=jnp.float32)
        )

    def recenter(self, new_position) -> "GridMap":
        """grid_map ``move()`` analog: translate the map window to the
        grid-aligned center nearest ``new_position``. Overlapping cells keep
        their values at unchanged world positions; newly exposed cells are
        NaN. Where grid_map rotates a circular-buffer start index, this is a
        device ``roll`` + masked NaN fill per layer — O(cells) HBM traffic,
        jit-able with a traced position, and every downstream kernel keeps
        zero-start-index static indexing (see module docstring).
        """
        rows, cols = self.size
        res = self.resolution
        target = jnp.asarray(new_position, jnp.float32)
        shift = jnp.round((target - self.position) / res).astype(jnp.int32)
        snapped = self.position + shift.astype(jnp.float32) * res
        # world point p: index_new = index_old + shift (index math above), so
        # new[i] = old[i - shift] -> roll by +shift with out-of-range NaN
        si, sj = shift[0], shift[1]
        valid = self.roll_valid_mask(rows, cols, si, sj)
        new_layers = {
            k: self.roll_layer(v, si, sj, valid) for k, v in self.layers.items()
        }
        return dataclasses.replace(self, layers=new_layers, position=snapped)

    def get_submap(self, position, length) -> Tuple["GridMap", bool]:
        """grid_map ``GridMap::getSubmap(position, length, isSuccess)`` analog.

        Clips the requested center+length rectangle to the map, snaps it to
        whole cells, and returns ``(submap, success)``. Success follows
        grid_map's semantics (GridMapMath.cpp getSubmapInformation): the
        requested CENTER must land inside the *generated* submap — a request
        entirely off-map clips to an edge sliver that no longer contains its
        center and fails; a partially-off-map request whose center is on the
        map succeeds with the clipped extent. Reference service use:
        /root/reference/traversability_estimation/src/TraversabilityEstimation.cpp:297-316
        (``map.getSubmap`` at :305; ``isSuccess`` is the service result,
        :309,315).

        Host-side method (float64 math, Python slicing) — the service layer
        is host code; do not call under jit.
        """
        rows, cols = self.size
        res = float(self.resolution)
        mpos = np.asarray(self.position, np.float64)
        L = np.array([rows * res, cols * res], np.float64)
        req_pos = np.asarray(position, np.float64).reshape(2)
        req_len = np.asarray(length, np.float64).reshape(2)

        def bound(p):
            # grid_map boundPositionToRange: clamp each coordinate into the
            # open interval (center - L/2, center + L/2) with a tiny inset so
            # the subsequent floor() lands on a real cell
            out = p.copy()
            for i in range(2):
                eps = 10.0 * np.finfo(np.float64).eps * max(abs(p[i]), 1.0)
                lo, hi = mpos[i] - 0.5 * L[i], mpos[i] + 0.5 * L[i]
                if out[i] <= lo:
                    out[i] = lo + eps
                elif out[i] >= hi:
                    out[i] = hi - eps
            return out

        def idx(p):
            # getIndexFromPosition: i = floor((center + L/2 - p) / res)
            return np.floor((mpos + 0.5 * L - p) / res).astype(int)

        top_left = bound(req_pos + 0.5 * req_len)  # largest coords = index 0,0 side
        bottom_right = bound(req_pos - 0.5 * req_len)
        tl, br = idx(top_left), idx(bottom_right)
        size = br - tl + 1
        sub_len = size * res
        # submap center from the top-left cell's outer corner
        tl_center = mpos + 0.5 * L - (tl + 0.5) * res
        sub_pos = (tl_center + 0.5 * res) - 0.5 * sub_len
        # success: requested center within the generated submap, grid_map's
        # checkIfPositionWithinMap bounds (lower edge exclusive, upper incl.)
        t = sub_pos + 0.5 * sub_len - req_pos
        ok = bool(np.all((t >= 0.0) & (t < sub_len)))
        sub_layers = {
            k: v[tl[0] : tl[0] + size[0], tl[1] : tl[1] + size[1]]
            for k, v in self.layers.items()
        }
        sub = GridMap(
            layers=sub_layers,
            resolution=res,
            position=jnp.asarray(sub_pos, jnp.float32),
            frame_id=self.frame_id,
            basic_layers=self.basic_layers,
        )
        return sub, ok

    # -- geometry ----------------------------------------------------------
    def cell_positions(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(rows, cols) arrays of cell-center x and y map-frame coordinates."""
        rows, cols = self.size
        res = self.resolution
        half = (jnp.asarray([rows, cols], jnp.float32) * res) * 0.5
        i = jnp.arange(rows, dtype=jnp.float32)[:, None]
        j = jnp.arange(cols, dtype=jnp.float32)[None, :]
        x = self.position[0] + half[0] - 0.5 * res - i * res
        y = self.position[1] + half[1] - 0.5 * res - j * res
        return jnp.broadcast_to(x, (rows, cols)), jnp.broadcast_to(y, (rows, cols))

    def index_of(self, xy: jnp.ndarray) -> jnp.ndarray:
        """Map-frame position(s) (..., 2) -> integer index(es) (..., 2).

        Truncation semantics match grid_map (valid only for in-map positions).
        """
        rows, cols = self.size
        res = self.resolution
        half = jnp.asarray([rows * res, cols * res], jnp.float32) * 0.5
        v = (self.position + half - jnp.asarray(xy, jnp.float32)) / res
        return jnp.floor(v).astype(jnp.int32)

    def position_of(self, index: jnp.ndarray) -> jnp.ndarray:
        """Integer index(es) (..., 2) -> cell-center position(s) (..., 2)."""
        rows, cols = self.size
        res = self.resolution
        half = jnp.asarray([rows * res, cols * res], jnp.float32) * 0.5
        return self.position + half - 0.5 * res - jnp.asarray(index, jnp.float32) * res

    def is_inside(self, xy: jnp.ndarray) -> jnp.ndarray:
        """grid_map checkIfPositionWithinMap: pos in (center-L/2, center+L/2]."""
        rows, cols = self.size
        res = self.resolution
        half = jnp.asarray([rows * res, cols * res], jnp.float32) * 0.5
        t = self.position + half - jnp.asarray(xy, jnp.float32)
        ok = (t >= 0.0) & (t < 2.0 * half)
        return jnp.all(ok, axis=-1)

    def valid_mask(self, layer: str = "elevation") -> jnp.ndarray:
        """True where `layer` holds finite data (grid_map ``isValid``)."""
        return jnp.isfinite(self.layers[layer])

    # -- host conversion ---------------------------------------------------
    def to_numpy(self) -> Dict[str, np.ndarray]:
        return {k: np.asarray(v) for k, v in self.layers.items()}

    def __repr__(self) -> str:  # keep short: layers can be many
        try:
            rows, cols = self.size
        except ValueError:
            rows = cols = 0
        return (
            f"GridMap({rows}x{cols} @ {self.resolution} m, "
            f"layers={sorted(self.layers.keys())}, frame={self.frame_id!r})"
        )
