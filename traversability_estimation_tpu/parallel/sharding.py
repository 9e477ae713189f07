"""SPMD map-tile sharding with ICI halo exchange + pose-batch query sharding.

The reference is single-threaded C++ with ROS services as its only
"distributed backend" (SURVEY.md §2.3); it has no multi-device story. This
module is the greenfield TPU scaling design:

- the elevation map is tiled over a 2-D ``jax.sharding.Mesh`` ("x", "y");
- each update runs the full filter chain + dense veto fields per tile inside
  ``shard_map``, after a two-phase halo exchange (``jax.lax.ppermute`` row
  strips then column strips, which also covers corners) sized to the largest
  stencil reach (the step veto's candidate window + gap walk dominates);
- out-of-GLOBAL-map halo cells are NaN-masked (elevation) and flagged via an
  ``in_map`` plane so tile-edge semantics are bit-identical to the unsharded
  kernels (validated tile-vs-whole in tests on a fake 8-device CPU mesh);
- footprint queries shard the pose batch across all devices against a
  replicated compact query state (traversability f32 + veto mask), the
  all-gather riding ICI once per map update.

Multi-host: the same code runs under ``jax.distributed.initialize`` — the
mesh simply spans hosts; see ``parallel.multihost``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from traversability_estimation_tpu.ops import filters as chain_ops
from traversability_estimation_tpu.ops import veto as veto_ops
from traversability_estimation_tpu.ops.filters import ChainConfig
from traversability_estimation_tpu.ops.veto import VetoConfig
from traversability_estimation_tpu.ops.footprint import QueryState

Array = jnp.ndarray


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """2-D ("x", "y") mesh over the available devices (grid as square as
    possible — halo volume scales with tile perimeter)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    gx = int(math.sqrt(n))
    while n % gx != 0:
        gx -= 1
    gy = n // gx
    return Mesh(np.asarray(devices).reshape(gx, gy), ("x", "y"))


def required_halo(chain_cfg: ChainConfig, veto_cfg: VetoConfig) -> int:
    """Halo width in cells covering every stencil's reach.

    Chain: normals / step windows / roughness radii. Veto: the count window
    (3*res) and the step veto's candidate circle (2.5*res) + bounded gap walk
    (<= ceil(max_gap/res) cells) — the dominant term (SURVEY.md §5: halo must
    cover the 0.3 m gap walk).
    """
    res = chain_cfg.resolution
    chain_reach = max(
        int(math.floor(chain_cfg.normals_radius / res + 1e-9)),
        int(math.floor(chain_cfg.step_first_window_radius / res + 1e-9))
        + int(math.floor(chain_cfg.step_second_window_radius / res + 1e-9)),
        int(math.floor(chain_cfg.roughness_estimation_radius / res + 1e-9)),
    ) + 1
    cand = int(math.floor(2.5 + 1e-9))
    walk = max(k for _, _, k in veto_ops._ray_directions(veto_cfg))
    count_window = 3
    veto_reach = max(count_window, cand + walk)
    # veto runs on chain outputs, which already consumed chain_reach of halo
    return chain_reach + veto_reach


def _exchange_axis(tile: Array, halo: int, axis: int, axis_name: str, fill) -> Array:
    """Prepend/append `halo` rows (axis=0) or columns (axis=1) from mesh
    neighbors along `axis_name`; global edges get `fill`."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if axis == 0:
        send_fwd = tile[-halo:, :]
        send_bwd = tile[:halo, :]
    else:
        send_fwd = tile[:, -halo:]
        send_bwd = tile[:, :halo]
    if n > 1:
        from_prev = jax.lax.ppermute(
            send_fwd, axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        from_next = jax.lax.ppermute(
            send_bwd, axis_name, [(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_prev = jnp.zeros_like(send_fwd)
        from_next = jnp.zeros_like(send_bwd)
    fill_prev = jnp.full_like(from_prev, fill)
    fill_next = jnp.full_like(from_next, fill)
    top = jnp.where(idx == 0, fill_prev, from_prev)
    bot = jnp.where(idx == n - 1, fill_next, from_next)
    return jnp.concatenate([top, tile, bot], axis=axis)


def halo_pad(tile: Array, halo: int, fill) -> Array:
    """Two-phase halo exchange: rows along 'x', then columns (including the
    new rows) along 'y' — corners arrive via the second phase."""
    padded = _exchange_axis(tile, halo, 0, "x", fill)
    return _exchange_axis(padded, halo, 1, "y", fill)


def _tile_update(
    elev_tile: Array,
    chain_cfg: ChainConfig,
    veto_cfg: VetoConfig,
    halo: int,
    orig_shape: Tuple[int, int],
) -> Dict[str, Array]:
    """Per-tile update body (runs inside shard_map): halo exchange -> chain +
    veto on the padded tile -> crop to the owned region.

    `orig_shape` is the un-padded global (H, W): cells at global indices
    beyond it (mesh-divisibility padding and out-of-map halos) are flagged
    not-in-map so tile semantics match the unsharded kernels exactly.
    """
    padded = halo_pad(elev_tile, halo, jnp.float32(jnp.nan))
    th, tw = elev_tile.shape
    gi0 = jax.lax.axis_index("x") * th - halo
    gj0 = jax.lax.axis_index("y") * tw - halo
    gi = gi0 + jnp.arange(th + 2 * halo)[:, None]
    gj = gj0 + jnp.arange(tw + 2 * halo)[None, :]
    in_map = (gi >= 0) & (gi < orig_shape[0]) & (gj >= 0) & (gj < orig_shape[1])

    layers = chain_ops.run_chain(padded, chain_cfg)
    veto = veto_ops.compute_veto_fields(
        {
            "elevation": padded,
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
    layers.update(veto)
    crop = lambda a: a[halo:-halo, halo:-halo]
    return {k: crop(v) for k, v in layers.items()}


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def sharded_update(
    elevation: Array,
    chain_cfg: ChainConfig,
    veto_cfg: VetoConfig,
    mesh: Mesh,
    halo: Optional[int] = None,
    orig_shape: Optional[Tuple[int, int]] = None,
) -> Dict[str, Array]:
    """Full map update tiled over the mesh. `elevation` (H, W) must divide
    evenly by the mesh grid (``pad_to_mesh`` on host first); output layers
    keep the ('x', 'y') sharding. `orig_shape` is the pre-padding shape."""
    if halo is None:
        halo = required_halo(chain_cfg, veto_cfg)
    if orig_shape is None:
        orig_shape = elevation.shape
    body = partial(
        _tile_update,
        chain_cfg=chain_cfg,
        veto_cfg=veto_cfg,
        halo=halo,
        orig_shape=orig_shape,
    )
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=P("x", "y"),
        out_specs=P("x", "y"),
        check_vma=False,
    )
    return fn(elevation)


def replicate_query_state(
    layers: Dict[str, Array],
    mesh: Mesh,
    position,
    resolution: float,
    default_traversability: float = 0.5,
) -> QueryState:
    """All-gather the two query planes so every device holds the full compact
    state; subsequent pose-batch queries are embarrassingly parallel."""
    rep = NamedSharding(mesh, P())
    trav = jax.lax.with_sharding_constraint(layers["traversability"], rep)
    mask = jax.lax.with_sharding_constraint(layers["traversable_mask"], rep)
    return QueryState(
        traversability=trav,
        traversable_mask=mask,
        position=jnp.asarray(position, jnp.float32),
        resolution=resolution,
        default_traversability=default_traversability,
    )


def shard_pose_batch(poses: Array, mesh: Mesh) -> Array:
    """Shard a (P, ...) pose/path batch across every device in the mesh."""
    spec = P(("x", "y"))
    return jax.device_put(poses, NamedSharding(mesh, spec))


def pad_to_mesh(elevation: np.ndarray, mesh: Mesh) -> Tuple[np.ndarray, Tuple[int, int]]:
    """NaN-pad (H, W) so both dims divide the mesh grid; returns (padded,
    original shape). NaN padding is semantically out-of-map-like for the
    chain; callers should crop results back to the original shape."""
    gx, gy = mesh.devices.shape
    H, W = elevation.shape
    Hp = ((H + gx - 1) // gx) * gx
    Wp = ((W + gy - 1) // gy) * gy
    if (Hp, Wp) == (H, W):
        return elevation, (H, W)
    out = np.full((Hp, Wp), np.nan, dtype=np.float32)
    out[:H, :W] = elevation
    return out, (H, W)


# ---------------------------------------------------------------------------
# Queries against the TILED map (no replication): pmin/psum verdict reduction
# ---------------------------------------------------------------------------
# For maps small enough to replicate, `replicate_query_state` + the local
# batched evaluators are fastest (embarrassingly parallel pose sharding).
# When the global map is too large to replicate per device, the dense circle
# field is computed tile-local (a stencil, so halo exchange suffices) and
# path checks run with every device evaluating ALL paths against ITS tile:
# each sampled cell is owned by exactly one device, so psum over the mesh
# assembles exact per-sample verdicts/scores and every device ends up with
# the full, identical result — the BASELINE north star's "pmin/psum verdict
# reduction over per-shard map tiles".


from traversability_estimation_tpu.ops import footprint as fp_ops

# check_circular_paths_tiled switches from the bit-exact per-SAMPLE psum to
# the O(paths)-bytes per-PATH partial psum above this many samples (round 5;
# see body_paths). Small batches keep bit-equality with the local evaluator.
_PATH_REDUCE_SAMPLES = 1 << 17


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def sharded_circle_field(
    layers: Dict[str, Array],
    mesh: Mesh,
    radius_max: float,
    radius_min: float,
    resolution: float,
    default_traversability: float = 0.5,
    orig_shape: Optional[Tuple[int, int]] = None,
) -> Tuple[Array, Array]:
    """dense_circle_field computed per tile with halo exchange; outputs stay
    ('x','y')-sharded. Bit-identical to the unsharded field (the spiral scan
    is a stencil of reach ceil(radius_max/res))."""
    trav = layers["traversability"]
    mask = layers["traversable_mask"]
    if orig_shape is None:
        orig_shape = trav.shape
    halo = int(math.ceil(radius_max / resolution - 1e-12)) + 1

    def body(trav_tile, mask_tile):
        tp = halo_pad(trav_tile, halo, jnp.float32(jnp.nan))
        mp = halo_pad(mask_tile.astype(jnp.float32), halo, jnp.float32(0.0)) > 0.5
        th, tw = trav_tile.shape
        gi0 = jax.lax.axis_index("x") * th - halo
        gj0 = jax.lax.axis_index("y") * tw - halo
        gi = gi0 + jnp.arange(th + 2 * halo)[:, None]
        gj = gj0 + jnp.arange(tw + 2 * halo)[None, :]
        in_map = (gi >= 0) & (gi < orig_shape[0]) & (gj >= 0) & (gj < orig_shape[1])
        state = fp_ops.QueryState(
            traversability=tp,
            traversable_mask=mp,
            position=jnp.zeros((2,), jnp.float32),  # scan is index-space only
            resolution=resolution,
            default_traversability=default_traversability,
        )
        ok, tv = fp_ops.dense_circle_field(state, radius_max, radius_min, in_map)
        return ok[halo:-halo, halo:-halo], tv[halo:-halo, halo:-halo]

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=(P("x", "y"), P("x", "y")),
        out_specs=(P("x", "y"), P("x", "y")), check_vma=False,
    )
    return fn(trav, mask)


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9))
def check_circular_paths_tiled(
    field_ok: Array,
    field_trav: Array,
    poses: Array,
    n_poses: Array,
    mesh: Mesh,
    position: Tuple[float, float],
    resolution: float,
    max_segment_cells: int,
    default_traversability: float = 0.5,
    orig_shape: Optional[Tuple[int, int]] = None,
) -> Tuple[Array, Array]:
    """Batched circular path checks against the ('x','y')-SHARDED dense
    circle field — no plane is ever replicated. Every device samples all
    paths from its own tile; per-sample results combine with one psum over
    the mesh (each in-map sample cell has exactly one owner), and the
    replicated segment/path aggregation matches the local evaluator
    bit-for-bit (tests pin tiled == unsharded).

    Single-pose paths are scored from the field at the pose's CELL CENTER —
    a documented deviation of this large-map extension (the local evaluator
    runs the exact sub-cell spiral; cell centers coincide for all multi-pose
    path samples either way).
    """
    H, W = field_ok.shape if orig_shape is None else orig_shape
    poses = jnp.asarray(poses, jnp.float32)
    Pn, N, _ = poses.shape
    n_poses = jnp.asarray(n_poses, jnp.int32)
    default = jnp.float32(default_traversability)
    n_dev = mesh.devices.size

    # global index math (same formula as fp_ops._index_of on the full map)
    p0 = (
        jnp.asarray(position, jnp.float32)
        + jnp.asarray([H, W], jnp.float32) * resolution * 0.5
    )

    def index_of(xy):
        return jnp.floor((p0 - xy) / resolution).astype(jnp.int32)

    from traversability_estimation_tpu.grid.geometry import line_cells_batch

    def _raster(poses_s, n_poses_s):
        """Pose batch -> subsampled segment cells (+ masks, endpoints).

        Runs SHARDED over the pose axis when the batch divides the mesh:
        the Bresenham expansion is the O(P * N * max_cells) arithmetic of
        this query, and round 3 ran it replicated on every device — which
        held per-device query cost constant in mesh size (the "12x tiled-
        query throughput collapse", VERDICT r3 weak #4; decomposition in
        scripts/profile_tiled.py). Only the subsampled S = max_cells/4
        slice is all-gathered for the owner-tile probe phase.
        """
        starts = poses_s[:, : max(N - 1, 1), :]
        ends = poses_s[:, 1:, :] if N > 1 else poses_s[:, :1, :]
        seg_valid = jnp.arange(1, max(N, 2))[None, :] < n_poses_s[:, None]
        cells, cell_valid, _ = line_cells_batch(
            index_of(ends), index_of(starts), max_segment_cells
        )
        S = (max_segment_cells + 3) // 4
        sample_ids = jnp.arange(S) * 4
        s_cells = cells[..., sample_ids, :]  # (p, N-1, S, 2)
        s_valid = cell_valid[..., sample_ids]
        # single-pose: a degenerate one-sample segment at the pose cell
        pose0_cell = index_of(poses_s[:, 0, :])[:, None, None, :]
        is_single = (n_poses_s == 1)[:, None, None]
        s_cells = jnp.where(is_single[..., None], pose0_cell, s_cells)
        s_valid = jnp.where(
            is_single, jnp.arange(S)[None, None, :] == 0, s_valid
        )
        seg_valid = seg_valid | (n_poses_s == 1)[:, None] * (
            jnp.arange(seg_valid.shape[1])[None, :] == 0
        )
        return s_cells, s_valid, seg_valid, starts, ends

    # Shard the rasterization only when its arithmetic is worth a second
    # collective round: measured on the virtual mesh (scripts/profile_tiled),
    # small batches are collective-latency-bound and the extra shard_map +
    # all-gather costs more than the replicated raster it saves (256x8
    # paths: 2.07 ms sharded vs 1.77 ms replicated at mesh 8); the config-5
    # rollout regime (100k x 12 x 16 cells) is raster-bound and shards.
    raster_work = Pn * max(N - 1, 1) * max_segment_cells
    if Pn % n_dev == 0 and n_dev > 1 and raster_work >= (1 << 18):
        # explicit shard_map: a bare sharding constraint is NOT enough —
        # XLA's spmd partitioner preferred all-gathering the (smaller)
        # pose array first and replicating the whole expansion
        raster = jax.shard_map(
            _raster, mesh=mesh,
            in_specs=(P(("x", "y")), P(("x", "y"))),
            out_specs=(P(("x", "y")),) * 5,
            check_vma=False,
        )
        s_cells, s_valid, seg_valid, starts, ends = raster(poses, n_poses)
        # all-gather ONLY the subsampled cells + masks (the probe phase
        # needs them replicated: every device probes its own tile for every
        # sample)
        rep = NamedSharding(mesh, P())
        s_cells, s_valid, seg_valid, starts, ends = (
            jax.lax.with_sharding_constraint(a, rep)
            for a in (s_cells, s_valid, seg_valid, starts, ends)
        )
    else:
        s_cells, s_valid, seg_valid, starts, ends = _raster(poses, n_poses)

    def _probe(ok_tile, trav_tile, s_cells):
        """Per-sample tile probe: (owned, in_global, ok_o, tv_o)."""
        th, tw = ok_tile.shape
        gi0 = jax.lax.axis_index("x") * th
        gj0 = jax.lax.axis_index("y") * tw
        gi = s_cells[..., 0]
        gj = s_cells[..., 1]
        li = gi - gi0
        lj = gj - gj0
        in_global = (gi >= 0) & (gi < H) & (gj >= 0) & (gj < W)
        owned = (
            (li >= 0) & (li < th) & (lj >= 0) & (lj < tw) & in_global
        )
        lin = jnp.clip(li, 0, th - 1) * tw + jnp.clip(lj, 0, tw - 1)
        ok_o = jnp.take(ok_tile.reshape(-1).astype(jnp.float32), lin)
        tv_o = jnp.take(trav_tile.reshape(-1), lin)
        return owned, in_global, ok_o, tv_o

    def body(ok_tile, trav_tile, s_cells, s_valid, seg_valid, starts, ends,
             n_poses):
        owned, in_global, ok_o, tv_o = _probe(ok_tile, trav_tile, s_cells)
        # exactly one owner per in-map sample -> psum assembles full values
        ok_sum = jax.lax.psum(jnp.where(owned, ok_o, 0.0), ("x", "y"))
        tv_sum = jax.lax.psum(jnp.where(owned, tv_o, 0.0), ("x", "y"))
        # in_global == owned-by-someone, computable analytically everywhere
        # (the round-4 code psum'd an owned-count plane for this)
        ok_s = jnp.where(in_global, ok_sum > 0.5, default != 0.0)
        trav_s = jnp.where(in_global, tv_sum, default)

        ok1 = jnp.all(jnp.where(s_valid[:, 0], ok_s[:, 0], True), axis=-1)
        trav1 = jnp.where(ok1, trav_s[:, 0, 0], 0.0)
        return fp_ops.aggregate_sampled_segments(
            ok_s, trav_s, s_valid, seg_valid, starts, ends, n_poses, ok1, trav1
        )

    def body_paths(ok_tile, trav_tile, s_cells, s_valid, seg_valid, starts,
                   ends, n_poses):
        """Samples -> paths reduction BEFORE the psum (round 5): the psum
        moves 4 per-PATH partial buffers instead of 3 per-SAMPLE planes —
        O(P) vs O(P*N*S) bytes on the wire (config 5: ~1.6 MB vs ~100 MB;
        the per-sample psum was a third of the projected mesh-8 budget,
        VERDICT r4 weak #6, and sank the 2-host DCN prediction).

        Exactness: the verdict is an AND of per-sample fails counted by
        each sample's unique owner — exact. The traversability mean sums
        owner partials in device-grouped order instead of sample order, so
        it can differ from the unsharded evaluator in the last ulp (the
        samples-mode psum is retained for small batches, where bit-equality
        with the local evaluator is pinned by tests). Off-global samples
        take the default verdict via ONE canonical contributor (device
        (0,0)) so nothing is double-counted."""
        owned, in_global, ok_o, tv_o = _probe(ok_tile, trav_tile, s_cells)
        is_dev0 = (jax.lax.axis_index("x") == 0) & (
            jax.lax.axis_index("y") == 0
        )
        take_default = ~in_global & is_dev0
        default_ok = bool(default_traversability != 0.0)

        # per-sample contributions (neutral where this device isn't the
        # sample's contributor)
        ok_samp = jnp.where(owned, ok_o > 0.5, True)
        if not default_ok:
            ok_samp = ok_samp & ~take_default
        tv_samp = jnp.where(owned, tv_o, 0.0) + jnp.where(
            take_default, default, 0.0
        )

        s_active = s_valid & seg_valid[..., None]
        not_ok_part = jnp.sum(
            (s_active & ~ok_samp).astype(jnp.float32), axis=(-2, -1)
        )  # (P,)
        n_s = jnp.maximum(jnp.sum(s_active, axis=-1), 1)  # (P, N-1) repl.
        seg_num_part = jnp.sum(
            jnp.where(s_active, tv_samp, 0.0), axis=-1
        )  # (P, N-1)
        # replicated weights, identical on every device (same math as
        # aggregate_sampled_segments)
        seg_len = jnp.linalg.norm(ends - starts, axis=-1)
        w = jnp.where(seg_valid, seg_len, 0.0)
        w_sum = jnp.sum(w, axis=-1, keepdims=True)
        w = jnp.where(w_sum > 0.0, w, seg_valid.astype(jnp.float32))
        path_num_part = jnp.sum((w / n_s) * seg_num_part, axis=-1)  # (P,)

        ok1_fail_part = jnp.sum(
            (s_valid[:, 0] & ~ok_samp[:, 0]).astype(jnp.float32), axis=-1
        )
        trav1_part = tv_samp[:, 0, 0]

        parts = jax.lax.psum(
            jnp.stack(
                [not_ok_part, path_num_part, ok1_fail_part, trav1_part], -1
            ),
            ("x", "y"),
        )
        not_ok, path_num, ok1_fail, trav1_v = (
            parts[:, 0], parts[:, 1], parts[:, 2], parts[:, 3]
        )
        multi_ok = not_ok == 0.0
        path_trav = path_num / jnp.maximum(jnp.sum(w, axis=-1), 1e-30)
        ok1 = ok1_fail == 0.0
        is_single = n_poses == 1
        safe = jnp.where(is_single, ok1, multi_ok) & (n_poses >= 1)
        trav = jnp.where(is_single, jnp.where(ok1, trav1_v, 0.0), path_trav)
        return safe, jnp.where(safe, trav, 0.0)

    samples = Pn * max(N - 1, 1) * ((max_segment_cells + 3) // 4)
    reduce_paths = samples >= _PATH_REDUCE_SAMPLES
    fn = jax.shard_map(
        body_paths if reduce_paths else body, mesh=mesh,
        in_specs=(P("x", "y"), P("x", "y"), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False,
    )
    return fn(
        field_ok, field_trav, s_cells, s_valid, seg_valid, starts, ends,
        n_poses,
    )


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def check_polygonal_paths_tiled(
    layers: Dict[str, Array],
    positions: Array,
    quaternions: Array,
    n_poses: Array,
    footprint_t: Tuple[Tuple[float, float], ...],
    mesh: Mesh,
    window,
    conservative: bool = False,
    position: Tuple[float, float] = (0.0, 0.0),
    resolution: float = 0.03,
    default_traversability: float = 0.5,
    orig_shape: Optional[Tuple[int, int]] = None,
) -> Tuple[Array, Array, Array]:
    """Batched polygonal footprint paths against the ('x','y')-SHARDED map —
    no replication. The convex-hull row-span formulation distributes
    naturally: every device computes the same global spans (replicated pose
    math), intersects each span with its own tile's column range, looks up
    its LOCAL prefix planes, and one psum over the mesh assembles the exact
    global reductions (each in-map cell belongs to exactly one tile).

    Restriction of this large-map mode: the footprint must be CONVEX (the
    single-pose branch also uses the span scorer). `footprint_t` is a static
    tuple of (x, y) vertex pairs; `window` as in fp_ops.polygon_window_cells.
    Returns (is_safe, traversability, area), replicated on every device.
    """
    from traversability_estimation_tpu.grid.geometry import (
        polygon_area,
        polygon_contains,
    )
    from traversability_estimation_tpu.ops.footprint import transform_footprint
    from traversability_estimation_tpu.ops.hull import convex_hull_batch

    footprint = np.asarray(footprint_t, np.float32)
    trav_full = layers["traversability"]
    mask_full = layers["traversable_mask"]
    H, W = trav_full.shape if orig_shape is None else orig_shape
    positions = jnp.asarray(positions, jnp.float32)
    quaternions = jnp.asarray(quaternions, jnp.float32)
    n_poses = jnp.asarray(n_poses, jnp.int32)
    Pn, N, _ = positions.shape
    V = footprint.shape[0]
    default = jnp.float32(default_traversability)
    wi, wj = (window, window) if isinstance(window, int) else window
    half_i, half_j = wi // 2, wj // 2
    p0x = float(position[0]) + H * resolution * 0.5
    p0y = float(position[1]) + W * resolution * 0.5

    def body(trav_tile, mask_tile, positions, quaternions, n_poses):
        th, tw = trav_tile.shape
        gi0 = jax.lax.axis_index("x") * th
        gj0 = jax.lax.axis_index("y") * tw

        # local prefix planes; cells beyond the ORIGINAL map bounds (mesh
        # divisibility padding) contribute nothing
        lrow = gi0 + jnp.arange(th)[:, None]
        lcol = gj0 + jnp.arange(tw)[None, :]
        in_map = (lrow < H) & (lcol < W)
        ok_t = mask_tile & in_map
        tvf = jnp.where(
            jnp.isfinite(trav_tile), trav_tile, default
        )
        counts_cell = ((~ok_t) & in_map).astype(jnp.int32) * 65536 + ok_t.astype(
            jnp.int32
        )
        tv_cell = jnp.where(ok_t, tvf, 0.0)
        zi = jnp.zeros((th, 1), jnp.int32)
        zf = jnp.zeros((th, 1), jnp.float32)
        counts_p = jnp.concatenate([zi, jnp.cumsum(counts_cell, axis=1)], axis=1)
        tv_p = jnp.concatenate([zf, jnp.cumsum(tv_cell, axis=1)], axis=1)

        def scorer(vertices, nv, anchors):
            """(ok, trav, n_cells) for convex polygons via tile-intersected
            span lookups + psum."""
            ai = jnp.floor(
                (p0x - anchors[:, 0]) / resolution
            ).astype(jnp.int32)
            aj = jnp.floor(
                (p0y - anchors[:, 1]) / resolution
            ).astype(jnp.int32)
            gi = ai[:, None] + (jnp.arange(wi, dtype=jnp.int32) - half_i)
            gj = aj[:, None] + (jnp.arange(wj, dtype=jnp.int32) - half_j)
            px = p0x - (gi.astype(jnp.float32) + 0.5) * resolution
            py = p0y - (gj.astype(jnp.float32) + 0.5) * resolution
            B = px.shape[0]
            cp = jnp.stack(
                [
                    jnp.broadcast_to(px[:, :, None], (B, wi, wj)),
                    jnp.broadcast_to(py[:, None, :], (B, wi, wj)),
                ],
                axis=-1,
            )
            inside = jax.vmap(polygon_contains)(vertices, nv, cp)
            any_row = jnp.any(inside, axis=-1)
            j_first = jnp.argmax(inside, axis=-1).astype(jnp.int32)
            j_last = wj - 1 - jnp.argmax(inside[..., ::-1], axis=-1).astype(jnp.int32)
            g0 = jnp.clip(gj[:, 0:1] + j_first, 0, W)
            g1 = jnp.clip(gj[:, 0:1] + j_last + 1, 0, W)
            row_ok = any_row & (gi >= 0) & (gi < H) & (g1 > g0)

            # intersect with this tile's rows/cols
            l0 = jnp.clip(g0 - gj0, 0, tw)
            l1 = jnp.clip(g1 - gj0, 0, tw)
            li = gi - gi0
            mine = row_ok & (li >= 0) & (li < th) & (l1 > l0)
            lrow_c = jnp.clip(li, 0, th - 1)
            lin0 = lrow_c * (tw + 1) + jnp.where(mine, l0, 0)
            lin1 = lrow_c * (tw + 1) + jnp.where(mine, l1, 0)
            c0 = jnp.take(counts_p.reshape(-1), lin0)
            c1 = jnp.take(counts_p.reshape(-1), lin1)
            t0 = jnp.take(tv_p.reshape(-1), lin0)
            t1 = jnp.take(tv_p.reshape(-1), lin1)
            dc = jnp.where(mine, c1 - c0, 0)
            dtv = jnp.where(mine, t1 - t0, 0.0)
            if B * wi >= _PATH_REDUCE_SAMPLES and wi * wj < 32768:
                # large batches: reduce rows -> polygons BEFORE the psum so
                # it moves (B,) buffers instead of (B, wi) — the circular
                # query's round-5 per-path partial trick. The packed int32
                # row counts sum exactly in any order (the wi*wj < 32768
                # guard keeps fail*65536 + pass within int32 per polygon);
                # the f32 score sum reorders device-grouped (allclose, not
                # bit-equal — small batches keep the bit-exact row psum).
                dc = jax.lax.psum(jnp.sum(dc, axis=-1), ("x", "y"))
                dtv = jax.lax.psum(jnp.sum(dtv, axis=-1), ("x", "y"))
                fail_cnt = dc // 65536
                pass_cnt = dc - fail_cnt * 65536
                fail = fail_cnt > 0
                n_cells = pass_cnt
                mean = dtv / jnp.maximum(n_cells, 1)
            else:
                dc = jax.lax.psum(dc, ("x", "y"))
                dtv = jax.lax.psum(dtv, ("x", "y"))
                fail_cnt = dc // 65536
                pass_cnt = dc - fail_cnt * 65536
                fail = jnp.sum(fail_cnt, axis=-1) > 0
                n_cells = jnp.sum(pass_cnt, axis=-1)
                mean = jnp.sum(dtv, axis=-1) / jnp.maximum(n_cells, 1)
            empty = (n_cells == 0) & ~fail
            ok = ~fail & jnp.where(empty, default != 0.0, True)
            trav = jnp.where(fail, 0.0, jnp.where(empty, default, mean))
            return ok, trav, n_cells

        polys = transform_footprint(footprint, positions, quaternions)
        ok1, trav1, _ = scorer(
            polys[:, 0, :, :], jnp.full((Pn,), V, jnp.int32), positions[:, 0, :2]
        )
        area1 = jax.vmap(polygon_area, in_axes=(0, None))(polys[:, 0], V)
        if N == 1:
            safe = ok1 & (n_poses >= 1)
            return (
                safe,
                jnp.where(ok1, trav1, 0.0),
                jnp.where(ok1, area1, 0.0),
            )

        prev = polys[:, :-1, :, :]
        cur = polys[:, 1:, :, :]
        if conservative:
            d = (positions[:, 1:, :2] - positions[:, :-1, :2])[:, :, None, :]
            poly1 = jnp.concatenate([prev, cur - d], axis=2)
            poly2 = jnp.concatenate([cur, prev + d], axis=2)
        else:
            poly1 = prev
            poly2 = cur
        Mv = poly1.shape[2]
        points = jnp.concatenate([poly1, poly2], axis=2)
        flat_pts = points.reshape(Pn * (N - 1), 2 * Mv, 2)
        hulls, n_hull = convex_hull_batch(
            flat_pts, jnp.full((Pn * (N - 1),), 2 * Mv, jnp.int32)
        )
        mids = 0.5 * (positions[:, 1:, :2] + positions[:, :-1, :2]).reshape(
            Pn * (N - 1), 2
        )
        seg_ok, seg_trav, _ = scorer(hulls, n_hull, mids)
        seg_ok = seg_ok.reshape(Pn, N - 1)
        seg_trav = seg_trav.reshape(Pn, N - 1)
        hull_area = jax.vmap(polygon_area)(hulls, n_hull).reshape(Pn, N - 1)
        poly1_flat = poly1.reshape(Pn * (N - 1), Mv, 2)
        poly1_area = jax.vmap(polygon_area, in_axes=(0, None))(
            poly1_flat, Mv
        ).reshape(Pn, N - 1)

        seg_valid = jnp.arange(1, N)[None, :] < n_poses[:, None]
        multi_ok = jnp.all(seg_ok | ~seg_valid, axis=-1)
        first_w = hull_area[:, 0]
        later_w = hull_area[:, 1:] - poly1_area[:, 1:]
        weights = jnp.concatenate([first_w[:, None], later_w], axis=1)
        weights = jnp.where(seg_valid, weights, 0.0)
        total_area = jnp.sum(weights, axis=-1)
        trav_multi = jnp.sum(weights * seg_trav, axis=-1) / jnp.where(
            total_area != 0.0, total_area, 1.0
        )
        is_single = n_poses == 1
        safe = jnp.where(is_single, ok1, multi_ok) & (n_poses >= 1)
        trav = jnp.where(is_single, jnp.where(ok1, trav1, 0.0), trav_multi)
        area = jnp.where(is_single, jnp.where(ok1, area1, 0.0), total_area)
        trav = jnp.where(safe, trav, 0.0)
        area = jnp.where(safe | is_single, area, 0.0)
        return safe, trav, area

    fn = jax.shard_map(
        body,
        mesh=mesh,
        # pose data explicitly replicated: closure capture of outer-jit
        # tracers is unreliable under shard_map(check_vma=False)
        in_specs=(P("x", "y"), P("x", "y"), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return fn(trav_full, mask_full, positions, quaternions, n_poses)


# ---------------------------------------------------------------------------
# Sharded online tick (BASELINE config 4 at multi-chip scale)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "chain_cfg", "veto_cfg", "radius", "offset", "resolution",
        "max_segment_cells", "default_traversability", "orig_shape",
        "position",
    ),
)
def sharded_online_tick(
    elevation: Array,
    patch: Array,
    merge_start: Array,
    poses: Array,
    n_poses: Array,
    *,
    mesh: Mesh,
    chain_cfg: ChainConfig,
    veto_cfg: VetoConfig,
    radius: float,
    offset: float,
    resolution: float,
    max_segment_cells: int,
    default_traversability: float = 0.5,
    orig_shape: Optional[Tuple[int, int]] = None,
    position: Tuple[float, float] = (0.0, 0.0),
):
    """One online tick on the ('x','y')-SHARDED map — BASELINE config 4's
    multi-chip form ("50 m map tiled across chips with halo exchange, online
    updates with incremental submap refresh") as a single compiled program:

    1. merge the (replicated, small) robot submap into the sharded
       elevation plane (`dynamic_update_slice` with a traced start — the
       SPMD partitioner scopes the write to the owning tiles);
    2. tiled full-map re-filter with ppermute halo exchange
       (``sharded_update``; at multi-chip tile sizes the full re-filter is
       faster than the single-chip incremental crop, so there is no
       incremental mode here — per-tile cost IS the incremental unit);
    3. per-tile dense circle field (``sharded_circle_field``);
    4. the tick's path batch with psum verdict reduction
       (``check_circular_paths_tiled``) — no plane is ever replicated.

    Returns (elevation', layers (sharded), safe (P,), trav (P,)). The same
    code runs on the virtual CPU mesh (tests) and a real slice.

    Caller contract: the patch must lie fully inside the (padded) map —
    ``dynamic_update_slice`` CLAMPS out-of-range starts, which would
    silently shift the write region instead of clipping it (the single-chip
    ``estimator.online_tick`` guards this host-side and clips via its
    fallback; do the same before calling here).
    """
    if orig_shape is None:
        orig_shape = elevation.shape
    elev2 = jax.lax.dynamic_update_slice(
        elevation, patch, (merge_start[0], merge_start[1])
    )
    elev2 = jax.lax.with_sharding_constraint(
        elev2, NamedSharding(mesh, P("x", "y"))
    )
    layers = sharded_update(
        elev2, chain_cfg, veto_cfg, mesh, orig_shape=orig_shape
    )
    ok_f, tv_f = sharded_circle_field(
        layers, mesh, radius + offset, radius, resolution,
        default_traversability, orig_shape,
    )
    safe, trav = check_circular_paths_tiled(
        ok_f, tv_f, poses, n_poses, mesh, position, resolution,
        max_segment_cells, default_traversability, orig_shape,
    )
    return elev2, layers, safe, trav
