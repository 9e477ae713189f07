"""Fused Pallas TPU kernel for the full map update (chain + veto fields).

STATUS (measured on TPU v5e, chained-scan device timing; tile sweep
re-run round 4, ABLATE_last.json E10): the XLA path in ops.filters/
ops.veto is the PRODUCTION path. At 336^2 the XLA fused update runs
0.15 ms; this kernel measures 0.56 ms at (128,128) tiles, 0.38 ms at
(192,256) — its best point — and regresses to 0.68 ms at (256,256)
(VMEM pressure: the straight-line body keeps many tile-sized temporaries
live). Compile times are tractable at these tiles (23/90/126 s; the
round-3 ">20 min" pathology was specific to (256,512)). Halo redundancy
alone (1.27-1.56x) does not explain the 2.5x gap at the best tile — the
rest is Mosaic codegen quality on this very large unrolled stencil body
vs XLA's full-map fusion with zero redundancy. Kept as the from-scratch
kernel demonstration and for shapes/configs where manual VMEM residency
wins.

This kernel fuses the ENTIRE
per-cell pipeline into one ``pallas_call``: each program DMAs one elevation
tile (+ stencil halo) from HBM into VMEM, computes normals/slope/step/
roughness/fusion and all veto fields entirely in VMEM, and writes the output
tiles — HBM traffic collapses to ~1 read + 5 writes of the map.

The tile body reuses the exact jnp compute from ``ops.filters`` /
``ops.veto`` (Pallas traces jnp ops), so numerics are identical to the XLA
path by construction; tests assert bit-parity.

Halo handling matches ``parallel.sharding``: the caller pre-pads the map with
`halo` NaN cells (plus an in-map plane for the gap-walk's edge-termination
semantics); each program reads an overlapping (T+2h, T+2h) window via manual
dynamic-slice DMA (BlockSpec windows cannot overlap).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from traversability_estimation_tpu.ops import filters as chain_ops
from traversability_estimation_tpu.ops import veto as veto_ops
from traversability_estimation_tpu.ops.filters import ChainConfig
from traversability_estimation_tpu.ops.veto import VetoConfig

Array = jnp.ndarray


def _tile_body(padded_tile: Array, in_map: Array, chain_cfg: ChainConfig,
               veto_cfg: VetoConfig, halo: int, out_tile: Tuple[int, int]):
    layers = chain_ops.run_chain(padded_tile, chain_cfg)
    veto = veto_ops.compute_veto_fields(
        {
            "elevation": padded_tile,
            "traversability_slope": layers["traversability_slope"],
            "traversability_step": layers["traversability_step"],
            **(
                {"traversability_roughness": layers["traversability_roughness"]}
                if veto_cfg.check_roughness
                else {}
            ),
        },
        veto_cfg,
        in_map=in_map,
    )
    th, tw = out_tile
    crop = lambda a: a[halo : halo + th, halo : halo + tw]
    outs = [
        crop(layers["traversability"]),
        crop(layers["traversability_slope"]),
        crop(layers["traversability_step"]),
        crop(
            layers["traversability_roughness"]
            if veto_cfg.check_roughness
            else layers["traversability_step"]
        ),
        crop(veto["traversable_mask"]).astype(jnp.float32),
    ]
    return outs


def _kernel(elev_hbm, inmap_hbm, trav_ref, slope_ref, step_ref, rough_ref,
            mask_ref, scratch_elev, scratch_in, sem0, sem1, *, tile, halo,
            row_window, lane_window, chain_cfg, veto_cfg):
    i = pl.program_id(0)
    j = pl.program_id(1)
    th, tw = tile
    cp0 = pltpu.make_async_copy(
        elev_hbm.at[pl.ds(i * th, row_window), pl.ds(j * tw, lane_window)],
        scratch_elev,
        sem0,
    )
    cp1 = pltpu.make_async_copy(
        inmap_hbm.at[pl.ds(i * th, row_window), pl.ds(j * tw, lane_window)],
        scratch_in,
        sem1,
    )
    cp0.start()
    cp1.start()
    cp0.wait()
    cp1.wait()
    outs = _tile_body(
        scratch_elev[:], scratch_in[:] > 0.5, chain_cfg, veto_cfg, halo, tile
    )
    trav_ref[:] = outs[0]
    slope_ref[:] = outs[1]
    step_ref[:] = outs[2]
    rough_ref[:] = outs[3]
    mask_ref[:] = outs[4]


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fused_update(
    elevation: Array,
    chain_cfg: ChainConfig,
    veto_cfg: VetoConfig,
    tile: Tuple[int, int] = (128, 128),
) -> Dict[str, Array]:
    """One fused kernel computing every chain layer + the veto mask.

    `elevation` (H, W); H and W are padded up to tile multiples internally.
    Returns the same layer dict as the XLA path (footprint parity layers
    derived outside the kernel — they are cheap elementwise maps).
    """
    from traversability_estimation_tpu.parallel.sharding import required_halo

    halo = required_halo(chain_cfg, veto_cfg)
    # Mosaic memref windows: sublane (rows) sizes/offsets 8-aligned, lane
    # (cols) sizes 128-aligned. Round the halo to 8 and over-fetch the lane
    # window to the next 128 multiple; junk columns past tw+2*halo are never
    # read by any stencil that survives the crop.
    halo = ((halo + 7) // 8) * 8
    H, W = elevation.shape
    th, tw = tile
    assert th % 8 == 0 and tw % 128 == 0, "tile must be (8k, 128m)"
    Hp = ((H + th - 1) // th) * th
    Wp = ((W + tw - 1) // tw) * tw
    grid = (Hp // th, Wp // tw)
    row_window = th + 2 * halo
    lane_window = ((tw + 2 * halo + 127) // 128) * 128

    pad_h = Hp - H
    pad_w = Wp - W
    # input padding: halo on top/left; enough on bottom/right for the last
    # tile's full fetch window
    bot = (grid[0] - 1) * th + row_window - (halo + H)
    right = (grid[1] - 1) * tw + lane_window - (halo + W)
    elev_p = jnp.pad(
        elevation.astype(jnp.float32),
        ((halo, bot), (halo, right)),
        constant_values=jnp.nan,
    )
    in_map = jnp.pad(
        jnp.ones((H, W), jnp.float32),
        ((halo, bot), (halo, right)),
        constant_values=0.0,
    )

    out_shape = [jax.ShapeDtypeStruct((Hp, Wp), jnp.float32) for _ in range(5)]
    out_spec = pl.BlockSpec((th, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _kernel, tile=tile, halo=halo, row_window=row_window,
        lane_window=lane_window, chain_cfg=chain_cfg, veto_cfg=veto_cfg,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid[0], grid[1]),
        in_specs=[
            # keep inputs in HBM and DMA overlapping windows manually
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((row_window, lane_window), jnp.float32),
            pltpu.VMEM((row_window, lane_window), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        # the straight-line body keeps many tile-sized temporaries live;
        # allow the compiler the full physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(elev_p, in_map)

    crop = lambda a: a[:H, :W]
    trav, slope, step, rough, maskf = (crop(o) for o in outs)
    mask = maskf > 0.5
    out: Dict[str, Array] = {
        "traversability": trav,
        "traversability_slope": slope,
        "traversability_step": step,
        "traversable_mask": mask,
    }
    if veto_cfg.check_roughness:
        out["traversability_roughness"] = rough
    # footprint parity layers (cheap elementwise; slope/step splits of the
    # mask are not recoverable from the fused mask — recompute the two count
    # vetoes, they are the cheap part) — derived lazily by callers that need
    # them via ops.veto; the fused path serves the query-critical planes.
    return out


def available() -> bool:
    """Whether the current backend can run the fused kernel.

    True only on a real TPU backend: the kernel body uses Mosaic-only
    primitives (manual HBM->VMEM async copies), which `pallas_call` cannot
    lower on CPU/GPU backends (interpret mode is not wired up here)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
