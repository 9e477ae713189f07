"""Node orchestrator + TCP service front-end tests (L4/L5 parity).

Covers the reference's process-level behaviors: periodic timer updates,
latched map publication, the 7-service API over the wire, pushed inputs
(initial grid map gate), and hot parameter reload
(TraversabilityEstimation.cpp:22-71, 172-200, 224-246, 331-377).
"""

import dataclasses
import time

import numpy as np
import pytest

from tests.conftest import synthetic_terrain
from traversability_estimation_tpu.node import TraversabilityNode
from traversability_estimation_tpu.service import (
    TraversabilityClient,
    TraversabilityServer,
)
from traversability_estimation_tpu.utils.config import EstimatorConfig
from traversability_estimation_tpu.utils.sources import ArraySource

RES = 0.03


def _source(seed=0, n=48):
    return ArraySource(
        elevation=synthetic_terrain(n, n, RES, seed=seed), resolution=RES
    )


@pytest.mark.slow
def test_timer_loop_updates_and_publishes():
    cfg = EstimatorConfig(resolution=RES, min_update_rate=20.0, map_length=(1.0, 1.0))
    node = TraversabilityNode(cfg, source=_source())
    # warm the jit compile inline so the timed loop below measures the timer,
    # not XLA compilation under full-suite CPU contention
    assert node.update_traversability()
    seen = []
    node.subscribe(seen.append)
    with node:
        deadline = time.time() + 60.0
        while node.update_count < 4 and time.time() < deadline:
            time.sleep(0.02)
    assert node.update_count >= 4  # 1 inline + >=3 timer ticks
    assert len(seen) >= 3
    assert "traversability" in seen[-1].layers


def test_persistent_map_mode_merges_submaps():
    cfg = EstimatorConfig(resolution=RES, min_update_rate=0.0, map_length=(0.6, 0.6))
    pose = {"xy": (-0.3, -0.3)}
    node = TraversabilityNode(
        cfg,
        source=_source(seed=5, n=64),
        robot_pose=lambda: pose["xy"],
        persistent_map_length=(64 * RES, 64 * RES),
    )
    assert node.update_traversability()
    rows, cols = node.estimator.traversability_map.size
    assert (rows, cols) == (64, 64)  # world map, not the submap size
    valid_1 = np.isfinite(
        np.asarray(node.estimator.traversability_map["elevation"])
    ).sum()
    pose["xy"] = (0.3, 0.3)  # robot moved; second submap adds coverage
    assert node.update_traversability()
    valid_2 = np.isfinite(
        np.asarray(node.estimator.traversability_map["elevation"])
    ).sum()
    assert valid_2 > valid_1


def test_latched_publication_replays_last_map():
    cfg = EstimatorConfig(resolution=RES, min_update_rate=0.0, map_length=(1.0, 1.0))
    node = TraversabilityNode(cfg, source=_source())
    assert not node.timer_enabled  # rate 0 disables the timer (cpp:38-42)
    assert node.request_update()  # runs inline when the timer is off
    late = []
    node.subscribe(late.append)  # subscribes AFTER the publish
    assert len(late) == 1  # latched replay


def test_timer_retries_after_source_failure():
    class FlakySource:
        def __init__(self, inner, fail_first):
            self.inner = inner
            self.fails_left = fail_first

        def sample(self, center, length):
            if self.fails_left > 0:
                self.fails_left -= 1
                raise ConnectionError("sensor offline")
            return self.inner.sample(center, length)

    cfg = EstimatorConfig(resolution=RES, min_update_rate=25.0, map_length=(1.0, 1.0))
    node = TraversabilityNode(cfg, source=FlakySource(_source(), fail_first=3))
    with node:
        deadline = time.time() + 60.0
        while node.update_count < 1 and time.time() < deadline:
            time.sleep(0.02)
    # all 3 failures counted, then recovery without operator action
    assert node.total_failures == 3
    assert node.consecutive_failures == 0
    assert node.update_count >= 1


def test_initial_grid_map_gate():
    cfg = EstimatorConfig(resolution=RES, min_update_rate=0.0)
    node = TraversabilityNode(cfg)
    elev = synthetic_terrain(32, 32, RES, seed=2)
    assert node.push_initial_grid_map(elev)
    # second push refused: map already initialized (cpp:331-337)
    assert not node.push_initial_grid_map(elev * 2.0)


def test_update_parameters_hot_reload():
    cfg = EstimatorConfig(resolution=RES, min_update_rate=0.0)
    node = TraversabilityNode(cfg)
    node.push_initial_grid_map(synthetic_terrain(32, 32, RES, seed=3))
    new = dataclasses.replace(cfg, min_update_rate=5.0)
    assert node.update_parameters(config=new)
    assert node.timer_enabled
    assert node.config.min_update_rate == 5.0


def test_update_parameters_yaml_merges_onto_current_config():
    """rosparam-load semantics: a YAML reload must NOT reset parameters the
    file does not mention (min_update_rate, map_length, ...)."""
    cfg = EstimatorConfig(
        resolution=RES, min_update_rate=0.0, map_length=(1.0, 1.0),
        max_gap_width=0.21,
    )
    node = TraversabilityNode(cfg)
    assert node.update_parameters(
        footprint_yaml="/root/reference/traversability_estimation/config/"
        "robot_footprint_parameter.yaml"
    )
    assert node.config.min_update_rate == 0.0  # preserved
    assert node.config.map_length == (1.0, 1.0)  # preserved
    assert node.config.max_gap_width == 0.21  # preserved
    assert not node.timer_enabled
    # the footprint values DID reload from the file (robot_footprint_parameter
    # .yaml ships traversability_default 0.3)
    assert node.config.footprint.traversability_default == 0.3
    assert node.config.footprint.circular_footprint_radius == 0.541


def test_update_parameters_spawns_and_stops_timer():
    """Enabling the rate on a started node spawns the timer thread; setting
    it to 0 stops it."""
    cfg = EstimatorConfig(resolution=RES, min_update_rate=0.0, map_length=(1.0, 1.0))
    node = TraversabilityNode(cfg, source=_source())
    node.update_traversability()  # warm compile
    with node:
        assert node._timer is None  # rate 0: no thread
        node.update_parameters(config=dataclasses.replace(cfg, min_update_rate=25.0))
        assert node._timer is not None
        deadline = time.time() + 60.0
        base = node.update_count
        while node.update_count < base + 2 and time.time() < deadline:
            time.sleep(0.02)
        assert node.update_count >= base + 2  # ticking at the new rate
        node.update_parameters(config=dataclasses.replace(cfg, min_update_rate=0.0))
        assert node._timer is None  # stopped


@pytest.fixture()
def server():
    cfg = EstimatorConfig(resolution=RES, min_update_rate=0.0, map_length=(1.0, 1.0))
    node = TraversabilityNode(cfg, source=_source(seed=7))
    with TraversabilityServer(node) as srv:
        yield srv


@pytest.mark.slow
def test_service_roundtrip_all_seven(server, tmp_path):
    host, port = server.address
    with TraversabilityClient(host, port) as cli:
        # 1. update_traversability
        resp = cli.update_traversability()
        assert resp["ok"] and resp["map_info"]["size"] == [33, 33]

        # 2. get_traversability with layer payloads
        resp = cli.get_traversability(layers=["traversability", "elevation"])
        assert resp["ok"]
        trav = resp["data"]["traversability"]
        assert trav.shape == tuple(resp["map_info"]["size"])
        assert np.isfinite(trav).any()

        # 3. check_footprint_path: circular + polygonal in one request
        resp = cli.check_footprint_path(
            [
                {"poses": [[0.0, 0.0], [0.1, 0.05]], "radius": 0.1},
                {
                    "poses": [[0.0, 0.0]],
                    "footprint": [[0.1, 0.08], [0.1, -0.08], [-0.1, -0.08], [-0.1, 0.08]],
                },
            ]
        )
        assert resp["ok"] and len(resp["results"]) == 2
        for r in resp["results"]:
            assert 0.0 <= r["traversability"] <= 1.0

        # 4. traversability_footprint (dense layers appear)
        resp = cli.traversability_footprint()
        assert resp["ok"]
        assert "traversability_x" in resp["map_info"]["layers"]

        # 5. save + 6. load round trip through the bag checkpoint
        ckpt = str(tmp_path / "srv.bag")
        assert cli.save_traversability_map_to_bag(ckpt)["ok"]
        assert cli.load_elevation_map(ckpt)["ok"]

        # 7. update_parameters from reference YAML
        resp = cli.update_parameters(
            footprint_yaml="/root/reference/traversability_estimation/config/robot_footprint_parameter.yaml"
        )
        assert resp["ok"]

        # error paths stay JSON
        resp = cli.call("no_such_service")
        assert not resp["ok"] and "unknown service" in resp["error"]
        resp = cli.get_traversability(layers=["nope"])
        assert not resp["ok"]


def test_service_push_elevation(server):
    host, port = server.address
    # fresh uninitialized node? server fixture node is uninitialized until
    # an update; push an initial map over the wire instead
    with TraversabilityClient(host, port) as cli:
        elev = synthetic_terrain(24, 24, RES, seed=11)
        assert cli.set_elevation_map(elev, (0.1, -0.2))["ok"]
        resp = cli.get_traversability(layers=["elevation"])
        assert resp["ok"]
        np.testing.assert_array_equal(
            np.nan_to_num(resp["data"]["elevation"], nan=-1.0),
            np.nan_to_num(elev, nan=-1.0),
        )
        assert resp["map_info"]["position"][:2] == pytest.approx([0.1, -0.2])


@pytest.mark.slow
def test_cli_run_golden(tmp_path, capsys):
    import os

    bag = "/root/reference/traversability_estimation/maps/elevation_map.bag"
    if not os.path.exists(bag):
        pytest.skip("golden bag not available")
    from traversability_estimation_tpu.__main__ import main

    out_bag = str(tmp_path / "cli.bag")
    rc = main(
        ["run", "--map", bag, "--check", "0,0", "0.3,0.2", "--save", out_bag]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    assert "map 100x133" in captured
    assert "path check" in captured
    assert os.path.exists(out_bag)


def test_service_get_traversability_submap(server):
    """get_traversability with position+length returns the clipped submap and
    the reference's isSuccess semantics (TraversabilityEstimation.cpp:297-316:
    map.getSubmap at :305, success flag as service result :309,315)."""
    host, port = server.address
    with TraversabilityClient(host, port) as cli:
        assert cli.update_traversability()["ok"]
        full = cli.get_traversability(layers=["traversability"])
        assert full["ok"]
        rows, cols = full["map_info"]["size"]
        res = full["map_info"]["resolution"]
        cx, cy = full["map_info"]["position"]

        # interior submap: ~0.3 m square around the center
        resp = cli.get_traversability(
            layers=["traversability"], position=(cx, cy), length=(0.31, 0.31)
        )
        assert resp["ok"]
        sr, sc = resp["map_info"]["size"]
        assert 0 < sr < rows and 0 < sc < cols
        sub = resp["data"]["traversability"]
        assert sub.shape == (sr, sc)
        # values are a contiguous block of the full plane
        fullp = full["data"]["traversability"]
        i0 = round((rows - sr) / 2)
        j0 = round((cols - sc) / 2)
        np.testing.assert_array_equal(
            np.nan_to_num(sub, nan=-7.0),
            np.nan_to_num(fullp[i0 : i0 + sr, j0 : j0 + sc], nan=-7.0),
        )

        # no layer filter -> all layers of the submap come back
        resp = cli.get_traversability(position=(cx, cy), length=(0.31, 0.31))
        assert resp["ok"]
        assert set(resp["data"]) == set(resp["map_info"]["layers"])

        # partially off-map: clipped but ok (center on-map)
        half_x = rows * res / 2
        resp = cli.get_traversability(
            layers=["traversability"],
            position=(cx + half_x - 2 * res, cy),
            length=(8 * res, 4 * res),
        )
        assert resp["ok"]
        assert resp["map_info"]["size"][0] < 8  # clipped at the edge

        # fully off-map: the reference's isSuccess=false -> ok=false
        resp = cli.get_traversability(
            layers=["traversability"],
            position=(cx + rows * res, cy),
            length=(4 * res, 4 * res),
        )
        assert not resp["ok"]
