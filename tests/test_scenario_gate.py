"""Unit tests for the scenario regression gate (scripts/collect_bench_extra):
the gate is load-bearing for every committed BENCH_extra claim, so its key
matching, transport-independent rollouts metric, and --regate audit mode
are pinned here (pure host logic — no chip)."""

import json
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
if SCRIPTS not in sys.path:
    sys.path.append(SCRIPTS)

import collect_bench_extra as cbe


def _write(tmp_path, name, entries):
    p = tmp_path / name
    p.write_text(json.dumps({"schema": "BENCH_extra v2", "entries": entries}))
    return str(p)


def _loop_row(hz, free=False, depth=1, dispatch_only=False):
    return {
        "kind": "online_loop", "mode": "persistent_map", "query": "circular",
        "pipelined_fetch": True, "free_run": free,
        "target_hz": 0.0 if free else 10.0, "map_cells": [100, 100],
        "paths_per_tick": 64, "fetch_depth": depth,
        "dispatch_only": dispatch_only, "achieved_hz": hz,
    }


def _rollouts_row(total, query_wait, fetch):
    return {
        "kind": "rollouts", "backend": "tpu", "map_cells": [500, 500],
        "rollouts": 1000, "poses": 8, "budget_p50_ms": total,
        "stage_p50_ms": {"update": 50.0, "gen": 20.0,
                         "query_dispatch": 10.0,
                         "query_wait": query_wait, "fetch": fetch},
    }


def test_transport_independent_rollouts_metric(tmp_path):
    """A 3x query_wait (tunnel bandwidth) swing with flat compute stages
    must NOT regress; a real compute regression must."""
    base = _write(tmp_path, "base.json", [_rollouts_row(400.0, 250.0, 50.0)])
    # same compute (100 ms), transport 3x worse -> clean
    slow_transport = [_rollouts_row(880.0, 750.0, 30.0)]
    regs, drift = cbe.gate_entries(slow_transport, base)
    assert regs == [] and drift == []
    # compute part 2.5x worse -> regression (rollouts fail tier is 2.0)
    slow_compute = [_rollouts_row(500.0, 200.0, 50.0)]
    regs, _ = cbe.gate_entries(slow_compute, base)
    assert len(regs) == 1 and regs[0]["worse_by"] == pytest.approx(2.5)


def test_new_mode_rows_never_gate_against_old(tmp_path):
    base = _write(tmp_path, "base.json", [_loop_row(50.0, free=True, depth=1)])
    # depth-3 row is a NEW key: no comparison, no false regression
    regs, drift = cbe.gate_entries([_loop_row(20.0, free=True, depth=3)], base)
    assert regs == [] and drift == []
    # same key, 2x worse -> regression (kernel tier 1.5)
    regs, _ = cbe.gate_entries([_loop_row(25.0, free=True, depth=1)], base)
    assert len(regs) == 1


def test_regate_rewrites_only_the_check_entry(tmp_path):
    base = _write(tmp_path, "base.json", [_loop_row(10.0)])
    out = _write(
        tmp_path, "out.json",
        [_loop_row(9.7),
         {"kind": "regression_check",
          "regressions": [{"stale": True}], "drift": []}],
    )
    regs = cbe.regate(out, base)
    blob = json.loads(open(out).read())
    checks = [e for e in blob["entries"] if e["kind"] == "regression_check"]
    assert len(checks) == 1
    assert regs == [] and checks[0]["regressions"] == []
    assert checks[0]["regated_against"] == "base.json"
    # the measured row itself is untouched
    assert blob["entries"][0]["achieved_hz"] == 9.7
