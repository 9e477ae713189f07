"""Pallas TPU kernel for the dense circle field (VMEM-resident spiral scan).

Why this kernel exists (the one place Pallas beats XLA here): the XLA
formulation of ``ops.footprint.dense_circle_field`` carries six (H, W)
planes through ~700 sequential spiral-offset updates. XLA fuses each offset
(or small groups) into separate kernels, so the carry planes round-trip HBM
hundreds of times — measured 3.7 ms at 336^2 / radius 0.45, 4% of the
roofline (bench.py pct_sol). The update itself is tiny (~10 ops/offset), so
the fix is residency, not arithmetic: tile the map, keep the six carry
planes AND the three input windows in VMEM for the whole spiral, and write
each tile's two result planes once.

Structure mirrors ops/pallas_chain.py: inputs stay in HBM, each program
manually DMAs one overlapping (tile + 2*halo) window (BlockSpec windows
cannot overlap), and the offset walk is a ``fori_loop`` over static spiral
tables in SMEM — the body compiles once (no unrolling), so Mosaic compile
time stays small, unlike the straight-line chain kernel.

First-fail semantics are bit-identical to the XLA path: the fori_loop
visits offsets in the same spiral order with the same select/or updates
(oracle-pinned in tests/test_footprint.py; this kernel is tested for exact
equality against dense_circle_field in tests/test_pallas.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from traversability_estimation_tpu.grid.geometry import spiral_order

Array = jnp.ndarray


def _kernel(
    offs_i, offs_j, radii,  # SMEM scalar-prefetch spiral tables
    fail_hbm, pass_hbm, tv_hbm,  # HBM planes, pre-padded by the caller
    ok_ref, trav_ref,  # VMEM output tiles
    s_all, sem0, sem1, sem2,  # scratch: the 3 windows stacked along rows
    *, tile, halo, row_window, lane_window, n_off, radius_min, radius_max,
    default,
):
    i = pl.program_id(0)
    j = pl.program_id(1)
    th, tw = tile
    cps = []
    for p, (hbm, sem) in enumerate(
        ((fail_hbm, sem0), (pass_hbm, sem1), (tv_hbm, sem2))
    ):
        cp = pltpu.make_async_copy(
            hbm.at[pl.ds(i * th, row_window), pl.ds(j * tw, lane_window)],
            s_all.at[pl.ds(p * row_window, row_window), :],
            sem,
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()

    # one stacked (3*row_window, lane_window) value: shifting it with TWO
    # dynamic rolls serves all three planes per offset. Mosaic rejects
    # unaligned dynamic sublane slices ("index in dimension 0 must be a
    # multiple of 8") and has no dynamic_slice on values, but
    # tpu.DynamicRotateOp (pltpu.roll) takes arbitrary dynamic shifts.
    # Rolling the stack never mixes planes: row p*row_window + r reads
    # p*row_window + r + oi with oi + th <= row_window.
    w_all = s_all[:]
    n_rows = 3 * row_window

    z = jnp.zeros((th, tw), jnp.float32)

    def body(t, carry):
        # `found` rides as f32 0/1: Mosaic cannot legalize scf.for with
        # i1-vector loop carries
        found_f, r_fail, cnt_b, sum_b, cnt, ssum = carry
        oi = offs_i[t] + halo
        oj = offs_j[t] + halo
        r_k = radii[t]
        w2 = pltpu.roll(w_all, n_rows - oi, axis=0)
        w2 = pltpu.roll(w2, lane_window - oj, axis=1)
        fail_f = w2[:th, :tw]  # already 0/1 f32
        pass_k = w2[row_window : row_window + th, :tw]
        tv_k = w2[2 * row_window : 2 * row_window + th, :tw]
        new_fail = (fail_f > 0.5) & (found_f < 0.5)
        r_fail = jnp.where(new_fail, r_k, r_fail)
        cnt_b = jnp.where(new_fail, cnt, cnt_b)
        sum_b = jnp.where(new_fail, ssum, sum_b)
        found_f = jnp.maximum(found_f, fail_f)
        cnt = cnt + pass_k
        ssum = ssum + tv_k
        return found_f, r_fail, cnt_b, sum_b, cnt, ssum

    found_f, r_fail, cnt_b, sum_b, cnt, ssum = jax.lax.fori_loop(
        0, n_off, body, (z, z, z, z, z, z)
    )
    found = found_f > 0.5

    # verdict assembly — same expressions as dense_circle_field's epilogue
    mean_all = ssum / jnp.maximum(cnt, 1.0)
    if radius_min == 0.0:
        ok = ~found
        trav = jnp.where(ok, mean_all, 0.0)
    else:
        hard = found & (r_fail <= radius_min)
        inflate = found & (r_fail > radius_min)
        factor = ((r_fail - radius_min) / (radius_max - radius_min) + 1.0) / 2.0
        mean_b = sum_b / jnp.maximum(cnt_b, 1.0)
        ok = ~hard
        trav = jnp.where(inflate, mean_b * factor, jnp.where(hard, 0.0, mean_all))
    empty = (cnt == 0.0) & ~found
    ok = ok & ~empty | (empty & (default != 0.0))
    trav = jnp.where(empty, jnp.float32(default), trav)
    ok_ref[:] = ok.astype(jnp.float32)
    trav_ref[:] = trav.astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 4))
def dense_circle_field_pallas(
    state,
    radius_max: float,
    radius_min: float,
    in_map: Optional[Array] = None,
    tile: Tuple[int, int] = (128, 256),
) -> Tuple[Array, Array]:
    """Drop-in replacement for ``ops.footprint.dense_circle_field`` on TPU.

    Same (ok, trav) results (exact-equality tested); `state` is a
    footprint.QueryState. Grid/halo setup mirrors pallas_chain.fused_update.
    """
    res = state.resolution
    offs_np, rings_np = spiral_order(radius_max, res)
    n_rings = int(math.ceil(radius_max / res - 1e-12))
    keep = np.ones(len(offs_np), dtype=bool)
    outer = rings_np >= max(n_rings - 1, 0)
    d2 = np.sum(offs_np.astype(np.float64) ** 2, axis=1) * res * res
    keep[outer] = d2[outer] <= radius_max * radius_max
    offs_np = offs_np[keep]
    radii_np = np.sqrt(np.sum(offs_np.astype(np.float64) ** 2, axis=1)) * res
    n_off = len(offs_np)
    R = int(np.max(np.abs(offs_np))) if n_off else 0

    H, W = state.shape
    fail_plane = ~state.traversable_mask
    tv = jnp.where(
        jnp.isfinite(state.traversability),
        state.traversability,
        state.default_traversability,
    )
    if in_map is not None:
        fail_plane = fail_plane & in_map
        in_f = in_map.astype(jnp.float32)
    else:
        in_f = None
    pass_plane = (~fail_plane).astype(jnp.float32)
    tv_plane = tv * pass_plane
    if in_f is not None:
        pass_plane = pass_plane * in_f
        tv_plane = tv_plane * in_f
    fail_f = fail_plane.astype(jnp.float32)

    th, tw = tile
    halo = ((R + 7) // 8) * 8
    Hp = ((H + th - 1) // th) * th
    Wp = ((W + tw - 1) // tw) * tw
    grid = (Hp // th, Wp // tw)
    row_window = th + 2 * halo
    lane_window = ((tw + 2 * halo + 127) // 128) * 128
    bot = (grid[0] - 1) * th + row_window - (halo + H)
    right = (grid[1] - 1) * tw + lane_window - (halo + W)

    def padp(a):
        return jnp.pad(a, ((halo, bot), (halo, right)), constant_values=0.0)

    offs_i = jnp.asarray(offs_np[:, 0], jnp.int32)
    offs_j = jnp.asarray(offs_np[:, 1], jnp.int32)
    radii = jnp.asarray(radii_np, jnp.float32)

    kernel = functools.partial(
        _kernel,
        tile=tile,
        halo=halo,
        row_window=row_window,
        lane_window=lane_window,
        n_off=n_off,
        radius_min=float(radius_min),
        radius_max=float(radius_max),
        default=float(state.default_traversability),
    )
    # index_map receives (i, j, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — ignore the scalar refs
    out_spec = pl.BlockSpec(
        (th, tw), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    ok_f, trav = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[out_spec, out_spec],
            scratch_shapes=[
                pltpu.VMEM((3 * row_window, lane_window), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
            jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(offs_i, offs_j, radii, padp(fail_f), padp(pass_plane), padp(tv_plane))

    return (ok_f[:H, :W] > 0.5), trav[:H, :W]
