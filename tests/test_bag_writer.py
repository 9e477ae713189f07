"""rosbag v2.0 writer tests — save_traversability_map_to_bag parity.

The reference checkpoints map state via GridMapRosConverter::saveToBag
(TraversabilityEstimation.cpp:318-329). Our writer must round-trip through
our reader, re-encode the shipped golden bag losslessly, and produce
structurally valid bags (header/chunk/index records).
"""

import struct

import numpy as np
import pytest

from tests.conftest import GOLDEN_ELEVATION_BAG, synthetic_terrain
from traversability_estimation_tpu.utils import rosbag as rb


def test_roundtrip_synthetic(tmp_path):
    rng = np.random.default_rng(0)
    layers = {
        "elevation": rng.standard_normal((17, 23)).astype(np.float32),
        "traversability": rng.random((17, 23)).astype(np.float32),
    }
    layers["elevation"][3, 5] = np.nan
    p = str(tmp_path / "rt.bag")
    rb.save_grid_map_bag(p, layers, 0.05, (1.25, -2.5), frame_id="odom")
    m = rb.load_grid_map_bag(p)
    assert m.frame_id == "odom"
    assert m.resolution == pytest.approx(0.05)
    assert m.position[:2] == pytest.approx((1.25, -2.5))
    assert m.length == pytest.approx((17 * 0.05, 23 * 0.05))
    assert m.basic_layers == ["traversability"]
    for k, v in layers.items():
        np.testing.assert_array_equal(m.data[k], v)


def test_reencode_golden_lossless(tmp_path):
    import os

    if not os.path.exists(GOLDEN_ELEVATION_BAG):
        pytest.skip("golden bags not available")
    g = rb.load_grid_map_bag(GOLDEN_ELEVATION_BAG)
    p = str(tmp_path / "golden_rt.bag")
    rb.write_grid_map_bag(p, g)
    g2 = rb.load_grid_map_bag(p)
    assert g2.layers == g.layers
    assert g2.resolution == g.resolution
    assert g2.position == pytest.approx(g.position)
    for k in g.data:
        np.testing.assert_array_equal(
            np.nan_to_num(g2.data[k], nan=-777.0),
            np.nan_to_num(g.data[k], nan=-777.0),
            err_msg=k,
        )


def test_bag_structure_is_spec_conformant(tmp_path):
    """Validate the record layout independently of our reader: magic,
    4096-byte padded bag header whose index_pos lands on a connection record,
    chunk-info record pointing back at the chunk."""
    p = str(tmp_path / "s.bag")
    rb.save_grid_map_bag(
        p, {"elevation": np.zeros((4, 4), np.float32)}, 0.1, (0, 0)
    )
    blob = open(p, "rb").read()
    magic = b"#ROSBAG V2.0\n"
    assert blob.startswith(magic)
    # bag header record occupies exactly 4096 bytes after the magic
    (hlen,) = struct.unpack_from("<I", blob, len(magic))
    fields = rb._parse_header(blob[len(magic) + 4 : len(magic) + 4 + hlen])
    assert fields[b"op"] == bytes([rb._OP_BAGHDR])
    (index_pos,) = struct.unpack("<Q", fields[b"index_pos"])
    (dlen,) = struct.unpack_from("<I", blob, len(magic) + 4 + hlen)
    assert 4 + hlen + 4 + dlen == 4096
    assert struct.unpack("<I", fields[b"conn_count"])[0] == 1
    assert struct.unpack("<I", fields[b"chunk_count"])[0] == 1
    # index section starts with the connection record
    recs = list(rb._iter_records(blob, index_pos))
    assert rb._parse_header(b"").get(b"op") is None  # sanity of helper
    ops = [h[b"op"][0] for h, _ in recs]
    assert ops == [rb._OP_CONNECTION, rb._OP_CHUNK_INFO]
    chunk_info_h, chunk_info_d = recs[1]
    (chunk_pos,) = struct.unpack("<Q", chunk_info_h[b"chunk_pos"])
    (chlen,) = struct.unpack_from("<I", blob, chunk_pos)
    ch_fields = rb._parse_header(blob[chunk_pos + 4 : chunk_pos + 4 + chlen])
    assert ch_fields[b"op"] == bytes([rb._OP_CHUNK])
    conn, count = struct.unpack("<II", chunk_info_d)
    assert (conn, count) == (0, 1)
    # connection metadata carries the real grid_map md5 + definition
    conn_fields = rb._parse_header(recs[0][1])
    assert conn_fields[b"md5sum"] == rb._GRID_MAP_MD5.encode()
    assert b"GridMapInfo info" in conn_fields[b"message_definition"]


@pytest.mark.slow
def test_estimator_save_load_bag_cycle(tmp_path):
    from traversability_estimation_tpu.models import TraversabilityEstimator
    from traversability_estimation_tpu.utils.config import EstimatorConfig

    est = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    elev = synthetic_terrain(32, 40, 0.03, seed=4)
    assert est.update(elev, position=(0.5, 0.25))
    p = str(tmp_path / "ckpt.bag")
    est.save(p)

    m = rb.load_grid_map_bag(p)
    np.testing.assert_array_equal(
        np.nan_to_num(m.data["elevation"], nan=-1.0), np.nan_to_num(elev, nan=-1.0)
    )
    assert "traversability" in m.data

    est2 = TraversabilityEstimator(EstimatorConfig(resolution=0.03))
    assert est2.load_elevation_map(p)  # recompute-on-load parity
    np.testing.assert_allclose(
        np.asarray(est2.traversability_map["traversability"]),
        np.asarray(est.traversability_map["traversability"]),
        rtol=0,
        atol=0,
        equal_nan=True,
    )
    assert np.asarray(est2._position) == pytest.approx([0.5, 0.25])
