"""Minimal pure-Python rosbag v2.0 reader + grid_map_msgs/GridMap decoder.

The reference checkpoints its map state to rosbag files
(/root/reference/traversability_estimation/src/TraversabilityEstimation.cpp:125-152,318-329
via GridMapRosConverter::loadFromBag/saveToBag) and ships two golden bags in
traversability_estimation/maps/. This module reads those bags WITHOUT any ROS
dependency so the golden input/output pair can gate our kernels in CI.

Only what the goldens need is implemented: bag format 2.0, chunk compressions
none/bz2, and deserialization of ``grid_map_msgs/GridMap``.
"""

from __future__ import annotations

import bz2
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

_OP_MSG = 0x02
_OP_BAGHDR = 0x03
_OP_CHUNK = 0x05
_OP_CONNECTION = 0x07


def _parse_header(buf: bytes) -> Dict[bytes, bytes]:
    fields: Dict[bytes, bytes] = {}
    off = 0
    while off < len(buf):
        (flen,) = struct.unpack_from("<I", buf, off)
        off += 4
        entry = buf[off : off + flen]
        off += flen
        key, _, value = entry.partition(b"=")
        fields[key] = value
    return fields


def _iter_records(buf: bytes, start: int = 0):
    off = start
    n = len(buf)
    while off + 8 <= n:
        (hlen,) = struct.unpack_from("<I", buf, off)
        off += 4
        header = _parse_header(buf[off : off + hlen])
        off += hlen
        (dlen,) = struct.unpack_from("<I", buf, off)
        off += 4
        data = buf[off : off + dlen]
        off += dlen
        yield header, data


@dataclass
class BagMessage:
    topic: str
    msg_type: str
    raw: bytes
    conn_id: int
    time_ns: int = 0


def read_bag(path: str) -> List[BagMessage]:
    """Return all messages in the bag (decompressing chunks as needed)."""
    with open(path, "rb") as f:
        blob = f.read()
    magic = b"#ROSBAG V2.0\n"
    if not blob.startswith(magic):
        raise ValueError(f"{path}: not a rosbag v2.0 file")
    connections: Dict[int, Tuple[str, str]] = {}
    messages: List[Tuple[int, int, bytes]] = []

    def handle(header: Dict[bytes, bytes], data: bytes):
        op = header.get(b"op", b"\x00")[0]
        if op == _OP_CONNECTION:
            conn_id = struct.unpack("<I", header[b"conn"])[0]
            conn_fields = _parse_header(data)
            topic = header.get(b"topic", b"").decode()
            msg_type = conn_fields.get(b"type", b"").decode()
            connections[conn_id] = (topic, msg_type)
        elif op == _OP_MSG:
            conn_id = struct.unpack("<I", header[b"conn"])[0]
            t = 0
            if b"time" in header:
                secs, nsecs = struct.unpack("<II", header[b"time"])
                t = secs * 1_000_000_000 + nsecs
            messages.append((conn_id, t, data))
        elif op == _OP_CHUNK:
            compression = header.get(b"compression", b"none").decode()
            if compression == "none":
                inner = data
            elif compression == "bz2":
                inner = bz2.decompress(data)
            elif compression == "lz4":
                import lz4.frame  # pragma: no cover - not in goldens

                inner = lz4.frame.decompress(data)
            else:
                raise ValueError(f"unsupported chunk compression: {compression}")
            for h, d in _iter_records(inner):
                handle(h, d)

    for header, data in _iter_records(blob, len(magic)):
        handle(header, data)

    out = []
    for conn_id, t, raw in messages:
        topic, msg_type = connections.get(conn_id, ("", ""))
        out.append(BagMessage(topic=topic, msg_type=msg_type, raw=raw, conn_id=conn_id, time_ns=t))
    return out


# ---------------------------------------------------------------------------
# grid_map_msgs/GridMap deserialization
# ---------------------------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def u16(self) -> int:
        (v,) = struct.unpack_from("<H", self.buf, self.off)
        self.off += 2
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.off)
        self.off += 4
        return v

    def f64(self) -> float:
        (v,) = struct.unpack_from("<d", self.buf, self.off)
        self.off += 8
        return v

    def string(self) -> str:
        n = self.u32()
        s = self.buf[self.off : self.off + n].decode()
        self.off += n
        return s

    def f32_array(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.buf, dtype="<f4", count=n, offset=self.off).copy()
        self.off += 4 * n
        return a


@dataclass
class GridMapMessage:
    frame_id: str
    resolution: float
    length: Tuple[float, float]
    position: Tuple[float, float, float]
    orientation: Tuple[float, float, float, float]
    layers: List[str]
    basic_layers: List[str]
    data: Dict[str, np.ndarray] = field(default_factory=dict)  # (rows, cols)
    outer_start_index: int = 0
    inner_start_index: int = 0

    @property
    def size(self) -> Tuple[int, int]:
        for arr in self.data.values():
            return arr.shape
        return (0, 0)


def decode_grid_map(raw: bytes) -> GridMapMessage:
    r = _Reader(raw)
    # GridMapInfo.header (std_msgs/Header)
    r.u32()  # seq
    r.u32()  # stamp secs
    r.u32()  # stamp nsecs
    frame_id = r.string()
    resolution = r.f64()
    length_x = r.f64()
    length_y = r.f64()
    px, py, pz = r.f64(), r.f64(), r.f64()
    ox, oy, oz, ow = r.f64(), r.f64(), r.f64(), r.f64()
    layers = [r.string() for _ in range(r.u32())]
    basic_layers = [r.string() for _ in range(r.u32())]
    n_arrays = r.u32()
    data: Dict[str, np.ndarray] = {}
    for li in range(n_arrays):
        dims = []
        for _ in range(r.u32()):
            label = r.string()
            size = r.u32()
            stride = r.u32()
            dims.append((label, size, stride))
        r.u32()  # data_offset
        values = r.f32_array(r.u32())
        # grid_map stores matrices with dim[0]=column_index (outer),
        # dim[1]=row_index (inner): data[col * rows + row].
        if len(dims) == 2:
            if dims[0][0].startswith("column"):
                cols, rows = dims[0][1], dims[1][1]
                mat = values.reshape(cols, rows).T
            else:
                rows, cols = dims[0][1], dims[1][1]
                mat = values.reshape(rows, cols)
        else:  # pragma: no cover - defensive
            mat = values.reshape(-1, 1)
        data[layers[li]] = np.ascontiguousarray(mat)
    outer_start = r.u16()
    inner_start = r.u16()
    if outer_start or inner_start:
        # Undo the circular-buffer start index (we keep dense storage).
        data = {
            k: np.roll(np.roll(v, -outer_start, axis=0), -inner_start, axis=1)
            for k, v in data.items()
        }
    return GridMapMessage(
        frame_id=frame_id,
        resolution=resolution,
        length=(length_x, length_y),
        position=(px, py, pz),
        orientation=(ox, oy, oz, ow),
        layers=layers,
        basic_layers=basic_layers,
        data=data,
        outer_start_index=outer_start,
        inner_start_index=inner_start,
    )


def load_grid_map_bag(path: str, topic: Optional[str] = None) -> GridMapMessage:
    """Load the first grid_map_msgs/GridMap message from a bag file."""
    for msg in read_bag(path):
        if msg.msg_type.endswith("GridMap") and (topic is None or msg.topic == topic):
            return decode_grid_map(msg.raw)
    raise ValueError(f"no GridMap message found in {path}")
