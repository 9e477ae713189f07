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
