"""Plumbing test for scripts/online_loop.py (CPU, tiny map): the scenario
collector's JSON contract — fetch-depth pipelining, dispatch-only mode,
upload probe fields — must not rot between chip runs."""

import json
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
if SCRIPTS not in sys.path:
    sys.path.append(SCRIPTS)


@pytest.mark.slow
def test_online_loop_json_contract(tmp_path):
    import online_loop

    out = tmp_path / "ol.json"
    online_loop.main([
        "--cpu", "--seconds", "1", "--rate", "0", "--map-m", "6",
        "--paths", "8", "--warmup-ticks", "1", "--json", str(out),
    ])
    row = json.loads(out.read_text())
    assert row["kind"] == "online_loop" and row["free_run"]
    assert row["fetch_depth"] == 3  # auto depth in free-run
    assert row["fetch_bytes"] == 8  # the safe plane only, 1 B per path
    assert row["upload_bytes_per_tick"] > 0
    assert row["upload_probe_ms"] >= 0.0
    assert row["ticks"] >= 1 and row["achieved_hz"] > 0

    out2 = tmp_path / "ol2.json"
    online_loop.main([
        "--cpu", "--seconds", "1", "--rate", "0", "--map-m", "6",
        "--paths", "8", "--warmup-ticks", "1", "--dispatch-only",
        "--json", str(out2),
    ])
    row2 = json.loads(out2.read_text())
    assert row2["dispatch_only"] and row2["query_ms"] == {}
    assert row2["drain_s"] >= 0.0  # final drain is inside measured_s
