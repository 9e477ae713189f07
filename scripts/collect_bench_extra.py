"""Collect BENCH_extra.json — the config-4/5 + scaling artifacts.

Runs each scenario in a fresh subprocess (clean JAX backend per config) and
assembles one regenerable JSON artifact the README cites:

1. online_loop (config 4): persistent 50 m map, 10 Hz target, on the chip.
2. online_loop --window-m: bounded-memory roaming window (recenter mode).
3. rollouts (config 5): 100k rollouts on the chip (reduced steps).
4. rollouts --tiled --cpu-mesh 8: the sharded-map pmin/psum path on the
   virtual mesh (plumbing demo; real-chip numbers come from the same flag
   on a pod).
5. scaling_bench: mesh 1/2/4/8 efficiency table (virtual mesh here).

Usage: python scripts/collect_bench_extra.py [--out BENCH_extra.json]
       [--quick]  (smaller workloads, ~3 min total)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_json(cmd, path, timeout=1200):
    print("::", " ".join(cmd), file=sys.stderr, flush=True)
    r = subprocess.run(
        cmd, cwd=REPO, timeout=timeout, stdout=subprocess.PIPE, stderr=None
    )
    out = []
    if path and os.path.exists(path):
        with open(path) as f:
            out = [json.loads(line) for line in f if line.strip()]
        os.unlink(path)
    # scripts that print JSON lines to stdout (scaling_bench)
    for line in r.stdout.decode().splitlines():
        line = line.strip()
        if line.startswith("{"):
            out.append(json.loads(line))
    if r.returncode != 0:
        out.append({"kind": "error", "cmd": cmd, "returncode": r.returncode})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_extra.json"))
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    tmp = tempfile.mktemp(suffix=".json")
    py = sys.executable
    results = []

    seconds = "6" if args.quick else "12"
    rollouts = "20000" if args.quick else "100000"
    map_m = "60" if args.quick else "200"

    results += run_json(
        [py, "scripts/online_loop.py", "--seconds", seconds, "--rate", "10",
         "--map-m", "50", "--json", tmp],
        tmp,
    )
    results += run_json(
        [py, "scripts/online_loop.py", "--seconds", seconds, "--rate", "10",
         "--window-m", "12", "--json", tmp],
        tmp,
    )
    results += run_json(
        [py, "scripts/rollouts.py", "--rollouts", rollouts, "--map-m", map_m,
         "--steps", "3", "--json", tmp],
        tmp,
    )
    results += run_json(
        [py, "scripts/rollouts.py", "--tiled", "--cpu-mesh", "8", "--map-m", "8",
         "--rollouts", "2048", "--poses", "6", "--steps", "2", "--json", tmp],
        tmp,
    )
    results += run_json(
        [py, "scripts/scaling_bench.py", "--sizes", "1", "2", "4", "8",
         "--tile", "128", "--k1", "2", "--k2", "6"],
        None,
    )

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out} ({len(results)} entries)", file=sys.stderr)


if __name__ == "__main__":
    main()
