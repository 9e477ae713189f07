"""ctypes bindings for the native (C++) components in csrc/.

- ``baseline_*``: the single-thread CPU reference baseline (exact reference
  semantics; the comparison floor for bench.py).

The shared objects are built by ``csrc/build.sh`` into
``traversability_estimation_tpu/_native/``; all entry points degrade
gracefully (raise ``NativeUnavailable``) when not built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_native")


class NativeUnavailable(RuntimeError):
    pass


def _ensure_built():
    """Build the native libs on first use if a toolchain is available."""
    if os.path.exists(os.path.join(_NATIVE_DIR, "libte_baseline.so")):
        return
    import subprocess

    build = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc", "build.sh"
    )
    if os.path.exists(build):
        subprocess.run(["sh", build], capture_output=True, timeout=120)


_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    _ensure_built()
    path = os.path.join(_NATIVE_DIR, "libte_baseline.so")
    if not os.path.exists(path):
        raise NativeUnavailable(f"{path} not built (run csrc/build.sh)")
    lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.te_run_chain.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        f32p, f32p, f32p, f32p,
    ]
    lib.te_check_polygon_paths.argtypes = [
        f32p, f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        f32p, f32p, f64p, ctypes.c_int, ctypes.c_int, f64p, ctypes.c_int,
        u8p, f64p,
    ]
    lib.te_check_circles.argtypes = [
        f32p, f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        f32p, f32p, f32p, f64p, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, u8p, f64p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def baseline_run_chain(
    elevation: np.ndarray, resolution: float, chain_cfg
) -> Dict[str, np.ndarray]:
    """Native single-thread filter chain (reference semantics)."""
    lib = _load()
    elev = np.ascontiguousarray(elevation, np.float32)
    rows, cols = elev.shape
    outs = [np.empty((rows, cols), np.float32) for _ in range(4)]
    lib.te_run_chain(
        elev, rows, cols, resolution,
        chain_cfg.normals_radius, chain_cfg.slope_critical_value,
        chain_cfg.step_critical_value, chain_cfg.step_first_window_radius,
        chain_cfg.step_second_window_radius, chain_cfg.step_critical_cell_number,
        chain_cfg.roughness_critical_value, chain_cfg.roughness_estimation_radius,
        *outs,
    )
    return {
        "traversability_slope": outs[0],
        "traversability_step": outs[1],
        "traversability_roughness": outs[2],
        "traversability": outs[3],
    }


_bag_lib = None


def _load_bag_lib():
    global _bag_lib
    if _bag_lib is not None:
        return _bag_lib
    _ensure_built()
    path = os.path.join(_NATIVE_DIR, "libte_rosbag.so")
    if not os.path.exists(path):
        raise NativeUnavailable(f"{path} not built (run csrc/build.sh)")
    lib = ctypes.CDLL(path)
    lib.te_bag_open.restype = ctypes.c_void_p
    lib.te_bag_open.argtypes = [ctypes.c_char_p]
    ip = ctypes.POINTER(ctypes.c_int)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.te_bag_info.argtypes = [ctypes.c_void_p, ip, ip, dp, dp, ip]
    lib.te_bag_layer_name.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
    ]
    lib.te_bag_layer.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.te_bag_close.argtypes = [ctypes.c_void_p]
    _bag_lib = lib
    return lib


def load_grid_map_bag_native(path: str):
    """Native fast path for reading a GridMap bag. Returns the same
    ``GridMapMessage`` as utils.rosbag.load_grid_map_bag; raises
    NativeUnavailable if the library is missing or the bag needs a feature
    only the Python reader has (e.g. bz2 chunks — caller should fall back)."""
    from traversability_estimation_tpu.utils.rosbag import GridMapMessage

    lib = _load_bag_lib()
    h = lib.te_bag_open(path.encode())
    if not h:
        raise NativeUnavailable(f"native reader could not decode {path}")
    try:
        rows = ctypes.c_int()
        cols = ctypes.c_int()
        res = ctypes.c_double()
        nl = ctypes.c_int()
        pos = (ctypes.c_double * 2)()
        lib.te_bag_info(h, ctypes.byref(rows), ctypes.byref(cols),
                        ctypes.byref(res), pos, ctypes.byref(nl))
        data = {}
        names = []
        for i in range(nl.value):
            nb = ctypes.create_string_buffer(128)
            lib.te_bag_layer_name(h, i, nb, 128)
            name = nb.value.decode()
            names.append(name)
            buf = np.empty((rows.value, cols.value), np.float32)
            lib.te_bag_layer(h, i, buf)
            data[name] = buf
        return GridMapMessage(
            frame_id="map",
            resolution=res.value,
            length=(rows.value * res.value, cols.value * res.value),
            position=(pos[0], pos[1], 0.0),
            orientation=(0.0, 0.0, 0.0, 1.0),
            layers=names,
            basic_layers=[],
            data=data,
        )
    finally:
        lib.te_bag_close(ctypes.c_void_p(h))


class BaselineQueryEngine:
    """Stateful native query engine: memo caches persist across calls within
    one map epoch (reference behavior)."""

    def __init__(
        self,
        layers: Dict[str, np.ndarray],
        resolution: float,
        critical_step_height: float = 0.12,
        max_gap_width: float = 0.3,
        default_traversability: float = 0.5,
    ):
        self._lib = _load()
        self.elev = np.ascontiguousarray(layers["elevation"], np.float32)
        self.trav = np.ascontiguousarray(layers["traversability"], np.float32)
        self.slope = np.ascontiguousarray(layers["traversability_slope"], np.float32)
        self.step = np.ascontiguousarray(layers["traversability_step"], np.float32)
        rows, cols = self.elev.shape
        self.rows, self.cols = rows, cols
        self.resolution = resolution
        self.critical_step_height = critical_step_height
        self.max_gap_width = max_gap_width
        self.default = default_traversability
        self._slope_memo = np.full((rows, cols), np.nan, np.float32)
        self._step_memo = np.full((rows, cols), np.nan, np.float32)
        self._trav_memo = np.full((rows, cols), np.nan, np.float32)

    def check_circles(
        self, centers: np.ndarray, radius_max: float, radius_min: float
    ) -> Tuple[np.ndarray, np.ndarray]:
        centers = np.ascontiguousarray(centers, np.float64).reshape(-1, 2)
        n = len(centers)
        ok = np.empty(n, np.uint8)
        trav = np.empty(n, np.float64)
        self._lib.te_check_circles(
            self.elev, self.trav, self.slope, self.step, self.rows, self.cols,
            self.resolution, self.critical_step_height, self.max_gap_width,
            self.default, self._slope_memo, self._step_memo, self._trav_memo,
            centers, n, radius_max, radius_min, ok, trav,
        )
        return ok.astype(bool), trav

    def check_polygon_paths(
        self,
        poses: np.ndarray,
        footprint: np.ndarray,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Polygonal footprint paths at identity orientation: per segment the
        convex hull of the footprint at both endpoint poses, PolygonIterator
        raster with the memoized veto cascade, area-weighted aggregation
        (TraversabilityMap.cpp:464-584 semantics)."""
        lib = self._lib
        poses = np.ascontiguousarray(poses, np.float64)
        P, N, _ = poses.shape
        fp = np.ascontiguousarray(footprint, np.float64)
        ok = np.empty(P, np.uint8)
        trav = np.empty(P, np.float64)
        lib.te_check_polygon_paths(
            self.elev, self.trav, self.slope, self.step, self.rows, self.cols,
            self.resolution, self.critical_step_height, self.max_gap_width,
            self.default, self._slope_memo, self._step_memo,
            poses, P, N, fp, len(fp), ok, trav,
        )
        return ok.astype(bool), trav
