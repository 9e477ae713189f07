"""Analytic ICI communication model for the sharded paths (VERDICT r3 #2).

With one physical chip attached, multi-chip perf cannot be measured — but
bytes-on-the-wire CAN be computed exactly from the same code the sharded
paths compile from, and priced against public v5e ICI numbers. This script
derives, for `sharded_update`, `sharded_circle_field`, the replicated-state
all-gather, and the tiled query's collectives:

  - bytes sent/received per device per call (exact, from halo widths /
    array shapes);
  - predicted comm time on v5e ICI (bandwidth-term + per-hop latency);
  - predicted weak-scaling efficiency at mesh 2/4/8 against the MEASURED
    single-chip compute times (BENCH_extra real-chip rows).

ICI constants (public, "How to Scale Your Model" / v5e spec): one-way
bandwidth ~4.5e10 B/s per link, 2D torus with independent links per axis,
per-hop latency ~1 us. The virtual-CPU-mesh efficiencies committed in
BENCH_extra are NOT predictions of this model — they measure gloo/XLA:CPU
collective infrastructure on one socket (scripts/profile_tiled.py shows the
psum-only floor growing 0.012 -> 0.30 ms with virtual-mesh size, which ICI
does not have).

Output: one JSON line per modeled collective + a summary -> COMM_MODEL.json
(committed artifact cited by docs/DESIGN.md §8).

Usage: python scripts/comm_model.py [--tile 256] [--paths 256 --poses 8]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.append(_REPO)

# public v5e ICI numbers (see module docstring)
ICI_BW = 4.5e10          # B/s one-way per link
ICI_HOP_LATENCY = 1e-6   # s per hop
F32 = 4

# DCN tier (VERDICT r4 missing #1): cross-HOST mesh edges ride the
# data-center network, not ICI. Public anchors ("How to Scale Your Model",
# production v5e pods): ~100-200 Gbit/s NIC per host, one-way latency in
# the tens of microseconds. Both the conservative and the optimistic
# bandwidth are emitted so the prediction brackets the hardware.
DCN_BW_LO = 1.25e10      # B/s per host (100 Gbit/s, conservative)
DCN_BW_HI = 2.5e10       # B/s per host (200 Gbit/s)
DCN_LATENCY = 25e-6      # s one-way


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=256,
                    help="per-device tile edge (weak scaling)")
    ap.add_argument("--paths", type=int, default=256)
    ap.add_argument("--poses", type=int, default=8)
    ap.add_argument("--max-cells", type=int, default=16)
    ap.add_argument("--radius", type=float, default=0.45)
    ap.add_argument("--res", type=float, default=0.03)
    ap.add_argument(
        "--t-update-ms", type=float, default=None,
        help="measured single-chip update time for the tile (defaults to "
        "the real-chip scaling row in BENCH_extra.json)",
    )
    ap.add_argument("--t-query-ms", type=float, default=None)
    args = ap.parse_args(argv)

    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.ops.veto import VetoConfig
    from traversability_estimation_tpu.parallel.sharding import required_halo

    res = args.res
    ccfg = ChainConfig(resolution=res)
    vcfg = VetoConfig(resolution=res)
    T = args.tile
    rows = []

    # measured single-chip compute anchors (real-chip rows, BENCH_extra)
    t_upd = args.t_update_ms
    t_qry = args.t_query_ms
    try:
        with open(os.path.join(_REPO, "BENCH_extra.json")) as f:
            entries = json.load(f)["entries"]
        for e in entries:
            if (
                e.get("kind") == "scaling_update"
                and e.get("backend") == "tpu"
                and e.get("mesh") == 1
                and t_upd is None
            ):
                t_upd = e["t_iter_ms"] * (T * T) / (e["map"][0] * e["map"][1])
            if (
                e.get("kind") == "scaling_tiled_query"
                and e.get("backend") == "tpu"
                and e.get("mesh") == 1
                and t_qry is None
            ):
                t_qry = e["t_iter_ms"]
    except (OSError, KeyError, json.JSONDecodeError):
        pass
    if t_upd is None:
        t_upd = 0.089  # BENCH_extra r3 real-chip row, 256^2 tile
    if t_qry is None:
        t_qry = 0.06

    def comm_time(bytes_per_device, hops=1, links=1):
        """Bandwidth term + latency term for a nearest-neighbor exchange."""
        return bytes_per_device / (ICI_BW * links) + hops * ICI_HOP_LATENCY

    # ---- 1. sharded_update halo exchange --------------------------------
    h = required_halo(ccfg, vcfg)
    # phase 1 (rows axis): send/recv 2 strips of (h, T) f32
    # phase 2 (cols axis): send/recv 2 strips of (h, T + 2h) — includes the
    # freshly received rows, which is how corners arrive
    halo_bytes = F32 * 2 * h * (T + (T + 2 * h))
    t_halo = comm_time(halo_bytes, hops=2, links=2)
    rows.append({
        "kind": "comm_model", "collective": "sharded_update_halo",
        "halo_cells": h, "tile": T,
        "bytes_per_device": halo_bytes,
        "t_comm_us": round(t_halo * 1e6, 2),
        "t_compute_ms_measured_1chip": round(t_upd, 4),
        "predicted_weak_efficiency": round(
            t_upd / (t_upd + t_halo * 1e3), 4
        ),
        "note": "weak scaling: halo volume is per-device constant, so the "
        "predicted efficiency is mesh-size independent (>=2 devices)",
    })

    # ---- 2. sharded_circle_field halo -----------------------------------
    h2 = int(math.ceil(args.radius / res - 1e-12)) + 1
    # two planes exchanged: traversability f32 + mask (exchanged as f32)
    field_bytes = 2 * F32 * 2 * h2 * (T + (T + 2 * h2))
    t_field_halo = comm_time(field_bytes, hops=2, links=2)
    rows.append({
        "kind": "comm_model", "collective": "sharded_circle_field_halo",
        "halo_cells": h2, "tile": T,
        "bytes_per_device": field_bytes,
        "t_comm_us": round(t_field_halo * 1e6, 2),
        "note": "per map epoch, amortized over every query against the "
        "field",
    })

    # ---- 3. replicated-query-state all-gather ---------------------------
    # replicate_query_state: trav f32 + mask bool over the GLOBAL map; ring
    # all-gather moves (D-1)/D of the global planes through each device
    for mesh_n in (2, 4, 8):
        gx = int(math.sqrt(mesh_n))
        while mesh_n % gx:
            gx -= 1
        gy = mesh_n // gx
        H, W = T * gx, T * gy
        plane_bytes = H * W * (F32 + 1)
        ag_bytes = plane_bytes * (mesh_n - 1) / mesh_n
        t_ag = comm_time(ag_bytes, hops=mesh_n - 1)
        rows.append({
            "kind": "comm_model", "collective": "replicate_query_state",
            "mesh": mesh_n, "map": [H, W],
            "bytes_per_device": int(ag_bytes),
            "t_comm_us": round(t_ag * 1e6, 2),
            "note": "once per map epoch; small-map mode only (large maps "
            "use the tiled path and never replicate)",
        })

    # ---- 4. tiled-query collectives -------------------------------------
    from traversability_estimation_tpu.parallel.sharding import (
        _PATH_REDUCE_SAMPLES,
    )

    Pn, N, MC = args.paths, args.poses, args.max_cells
    S = (MC + 3) // 4
    samples = Pn * max(N - 1, 1) * S
    # bytes model follows the code's mode switch: below the threshold, two
    # per-sample f32 psums (ok, trav — the round-4 owner psum is now
    # analytic); above it, ONE stacked (P, 4) per-path partial psum
    # (body_paths). Ring all-reduce moves 2(D-1)/D of the buffer per device.
    if samples >= _PATH_REDUCE_SAMPLES:
        psum_bytes_1 = 4 * Pn * F32
    else:
        psum_bytes_1 = 2 * samples * F32
    # sharded-raster mode adds the s_cells/masks all-gather
    ag_cells_bytes = samples * 2 * F32 + samples * 1 + Pn * (N - 1) * 1
    for mesh_n in (2, 4, 8):
        pb = psum_bytes_1 * 2 * (mesh_n - 1) / mesh_n
        t_ps = comm_time(pb, hops=mesh_n - 1)
        ag = ag_cells_bytes * (mesh_n - 1) / mesh_n
        t_ag2 = comm_time(ag, hops=mesh_n - 1)
        rows.append({
            "kind": "comm_model", "collective": "tiled_query",
            "mesh": mesh_n, "paths": Pn, "poses": N, "samples": samples,
            "psum_bytes_per_device": int(pb),
            "t_psum_us": round(t_ps * 1e6, 2),
            "t_raster_allgather_us": round(t_ag2 * 1e6, 2),
            "t_query_ms_measured_1chip": t_qry,
            "predicted_query_overhead_pct": round(
                100 * (t_ps + t_ag2) * 1e3 / t_qry, 1
            ),
            "note": "per-device probe work is replicated by design (each "
            "device probes its tile for every sample), so tiled-query "
            "throughput is ~flat in mesh size; the collectives above are "
            "the only added cost on ICI",
        })

    # ---- 5. config-5 rollout projection at 8 chips ----------------------
    # Measured single-chip stages (BENCH_extra rollouts_device_gen, 100k x
    # 12 on the 44M-cell map): update / field / score. Tiled at mesh 8:
    # update+field are O(cells) stencils -> /8 + halo; the score's sharded
    # raster -> /8; its psums move the full sample buffers.
    try:
        with open(os.path.join(_REPO, "BENCH_extra.json")) as f:
            entries = json.load(f)["entries"]
        dg = next(
            (e for e in entries if e.get("kind") == "rollouts_device_gen"),
            None,
        )
    except (OSError, KeyError, json.JSONDecodeError):
        dg = None
    if dg and "stage_p50_ms" in dg:
        st = dg["stage_p50_ms"]
        n = 8
        samples5 = dg["rollouts"] * (dg["poses"] - 1) * 4
        # config-5 batches are far above _PATH_REDUCE_SAMPLES: the psum is
        # the stacked (rollouts, 4) per-path partial buffer (round 5), not
        # the round-4 per-sample planes
        psum5 = 4 * dg["rollouts"] * F32 * 2 * (n - 1) / n
        t_ps5 = comm_time(psum5, hops=n - 1)
        proj = (
            st["update"] / n + t_halo * 1e3
            + st["field"] / n + t_field_halo * 1e3
            + st["score"] / n + t_ps5 * 1e3
        )
        rows.append({
            "kind": "comm_model", "collective": "config5_rollouts_mesh8",
            "measured_1chip_ms": dg["budget_p50_ms"],
            "stages_1chip_ms": st,
            "psum_bytes_per_device": int(psum5),
            "t_psum_ms": round(t_ps5 * 1e3, 2),
            "projected_mesh8_ms": round(proj, 1),
            "note": "update/field/score divide by 8 (tiled stencils + "
            "sharded raster); the verdict psums dominate the added comm",
        })

    # ---- 6. DCN tier: 2-host predictions vs the >=80% BASELINE target ---
    # Topology: 2 hosts, --dcn-devices chips each, map split host-by-host
    # on the row axis; the one cross-host mesh edge pays DCN for its halo
    # strips / reduced psum buffers (in-host reduction rides ICI first —
    # hierarchical collectives, XLA's default on multi-host meshes).
    Dh = 4  # devices per host (v5e-4 per host is the smallest pod unit)

    def dcn_rows(name, cross_bytes_per_host, t_compute_ms, overlap_ms=None):
        """Two rows (lo/hi DCN bandwidth). Efficiency bars:
        - no_overlap: comm serialized after compute;
        - overlapped: the stencil's interior work (overlap_ms, defaults to
          0.9 * compute) hides comm issued first — the standard halo
          pattern the sharded update already uses (strips are slices, the
          exchange can be issued before interior compute)."""
        hide = 0.9 * t_compute_ms if overlap_ms is None else overlap_ms
        out = []
        for bw, tag in ((DCN_BW_LO, "100Gb"), (DCN_BW_HI, "200Gb")):
            t_dcn = (cross_bytes_per_host / bw + DCN_LATENCY) * 1e3  # ms
            eff_serial = t_compute_ms / (t_compute_ms + t_dcn)
            eff_overlap = t_compute_ms / (
                t_compute_ms + max(0.0, t_dcn - hide)
            )
            out.append({
                "kind": "comm_model_dcn", "collective": name, "hosts": 2,
                "devices_per_host": Dh, "dcn": tag,
                "cross_bytes_per_host": int(cross_bytes_per_host),
                "t_dcn_ms": round(t_dcn, 4),
                "t_compute_ms": round(t_compute_ms, 4),
                "predicted_2host_efficiency_no_overlap": round(eff_serial, 3),
                "predicted_2host_efficiency_overlapped": round(eff_overlap, 3),
                "meets_80pct_target": bool(eff_overlap >= 0.80),
            })
        return out

    # (a) weak-scaling sharded update: boundary devices exchange h x T
    #     strips with the peer host (send + recv), Dh tiles side by side
    #     along the cut
    upd_cross = F32 * 2 * h * T * Dh
    rows += dcn_rows("sharded_update_2host", upd_cross, t_upd)

    # (b) config 4 online tick at 50 m (1667^2): per-tick halo strips along
    #     the cut (full map width) + the tick's verdict psum (reduced
    #     in-host over ICI first; the cross-host leg moves ONE reduced
    #     buffer each way). Compute anchor: the measured fused-tick
    #     dispatch p50 from the committed online_loop row.
    t_tick = None
    paths_tick, poses_tick = 256, 10
    try:
        with open(os.path.join(_REPO, "BENCH_extra.json")) as f:
            entries4 = json.load(f)["entries"]
        ol = next(
            (e for e in entries4 if e.get("kind") == "online_loop"
             and not e.get("free_run") and e.get("query") == "circular"
             and e.get("mode") == "persistent_map"),
            None,
        )
        if ol:
            t_tick = ol["update_ms"]["p50_ms"]
            paths_tick = ol.get("paths_per_tick", 256)
    except (OSError, KeyError, json.JSONDecodeError):
        pass
    if t_tick is None:
        t_tick = 2.4  # BENCH_extra r4 fused-tick dispatch p50
    Wmap = 1667
    tick_halo = F32 * 2 * h * Wmap
    tick_psum = 3 * paths_tick * max(poses_tick - 1, 1) * 4 * F32
    rows += dcn_rows(
        "config4_online_tick_2host", tick_halo + tick_psum, t_tick
    )

    # (c) config 5 rollouts: stages divide by 2*Dh devices; the cross-host
    #     leg moves the in-host-reduced verdict psum buffer once each way.
    #     Psums cannot hide behind the score stage that produces them, so
    #     the overlap credit is the update+field stages only.
    if dg and "stage_p50_ms" in dg:
        st5 = dg["stage_p50_ms"]
        n_dev = 2 * Dh
        # per-PATH partial psum (round 5, body_paths): the cross-host leg
        # moves the in-host-reduced (rollouts, 4) f32 buffer once each way
        psum_buf = 4 * dg["rollouts"] * F32
        compute5 = (st5["update"] + st5["field"] + st5["score"]) / n_dev
        rows += dcn_rows(
            "config5_rollouts_2host", 2 * psum_buf, compute5,
            overlap_ms=(st5["update"] + st5["field"]) / n_dev,
        )

    summary = {
        "kind": "comm_model_summary",
        "ici_bw_per_link_Bps": ICI_BW,
        "ici_hop_latency_s": ICI_HOP_LATENCY,
        "headline": {
            "update_weak_efficiency_mesh_ge2": rows[0][
                "predicted_weak_efficiency"
            ],
            "field_halo_us": rows[1]["t_comm_us"],
            "dcn_2host": {
                r["collective"]: {
                    "overlapped": r[
                        "predicted_2host_efficiency_overlapped"
                    ],
                    "no_overlap": r[
                        "predicted_2host_efficiency_no_overlap"
                    ],
                }
                for r in rows
                if r.get("kind") == "comm_model_dcn" and r["dcn"] == "100Gb"
            },
        },
        "contrast": "virtual-CPU-mesh efficiencies in BENCH_extra measure "
        "single-socket collective infrastructure (psum-only floor grows "
        "0.012->0.30 ms with mesh size, scripts/profile_tiled.py), not ICI; "
        "this model is the real-slice prediction",
    }
    for r in rows:
        print(json.dumps(r))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
