"""Multi-chip sharding on the virtual 8-device CPU mesh.

The gate: tiled shard_map update (halo exchange incl. corners, global-edge
masking, mesh-divisibility padding) must be bit-identical to the unsharded
kernels, and sharded pose-batch queries must match replicated ones.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from traversability_estimation_tpu.ops.filters import ChainConfig, run_chain_jit
from traversability_estimation_tpu.ops.veto import VetoConfig, compute_veto_fields_jit
from traversability_estimation_tpu.ops import footprint as fp_ops
from traversability_estimation_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 fake CPU devices"
    return sh.make_mesh(8)


CHAIN = ChainConfig(resolution=0.03)
VETO = VetoConfig(resolution=0.03, check_roughness=True)


def _reference(elev):
    layers = run_chain_jit(jnp.asarray(elev), CHAIN)
    veto = compute_veto_fields_jit(
        {
            "elevation": jnp.asarray(elev),
            "traversability_slope": layers["traversability_slope"],
            "traversability_step": layers["traversability_step"],
            "traversability_roughness": layers["traversability_roughness"],
        },
        VETO,
    )
    layers.update(veto)
    return layers


@pytest.mark.parametrize(
    "shape",
    [(96, 96), pytest.param((100, 133), marks=pytest.mark.slow)],
)  # odd shape -> padding
def test_sharded_update_matches_unsharded(mesh, terrain, shape):
    elev = terrain(shape[0], shape[1], 0.03, seed=31, nan_frac=0.1)
    padded, orig = sh.pad_to_mesh(elev, mesh)
    out = sh.sharded_update(jnp.asarray(padded), CHAIN, VETO, mesh, None, orig)
    ref = _reference(elev)
    H, W = orig
    for k in ("traversability", "traversability_slope", "traversability_step"):
        a = np.asarray(out[k])[:H, :W]
        b = np.asarray(ref[k])
        assert (np.isfinite(a) == np.isfinite(b)).all(), k
        both = np.isfinite(a) & np.isfinite(b)
        np.testing.assert_allclose(a[both], b[both], atol=3e-7, err_msg=k)
    for k in ("traversable_mask", "slope_ok", "step_ok", "roughness_ok"):
        np.testing.assert_array_equal(np.asarray(out[k])[:H, :W], np.asarray(ref[k]), k)


def test_sharded_update_golden(mesh, golden_map):
    elev = golden_map.data["elevation"]
    padded, orig = sh.pad_to_mesh(elev, mesh)
    out = sh.sharded_update(jnp.asarray(padded), CHAIN, VETO, mesh, None, orig)
    H, W = orig
    ours = np.asarray(out["traversability"])[:H, :W]
    g = golden_map.data["traversability"]
    assert (np.abs(ours - g) > 1e-3).sum() <= 2


@pytest.mark.slow
def test_replicated_queries_match(mesh, terrain, rng):
    elev = terrain(96, 96, 0.03, seed=33, nan_frac=0.05)
    out = sh.sharded_update(jnp.asarray(elev), CHAIN, VETO, mesh)
    state = sh.replicate_query_state(out, mesh, (0.0, 0.0), 0.03, 0.5)

    P, N = 64, 4
    starts = np.stack([rng.uniform(-1, 1, P), rng.uniform(-1, 1, P)], -1)
    steps = rng.uniform(-0.15, 0.15, (P, N - 1, 2))
    poses = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    ).astype(np.float32)
    n_poses = np.full((P,), N, np.int32)

    sharded_poses = sh.shard_pose_batch(jnp.asarray(poses), mesh)
    safe_s, trav_s = jax.jit(
        fp_ops.check_circular_paths, static_argnums=(3, 4, 5)
    )(state, sharded_poses, jnp.asarray(n_poses), 0.25, 0.15, 32)

    # unsharded reference
    ref_layers = _reference(elev)
    ref_state = fp_ops.QueryState(
        ref_layers["traversability"],
        ref_layers["traversable_mask"],
        jnp.zeros(2, jnp.float32),
        0.03,
        0.5,
    )
    safe_r, trav_r = fp_ops.check_circular_paths(
        ref_state, jnp.asarray(poses), jnp.asarray(n_poses), 0.25, 0.15, 32
    )
    np.testing.assert_array_equal(np.asarray(safe_s), np.asarray(safe_r))
    np.testing.assert_allclose(np.asarray(trav_s), np.asarray(trav_r), atol=1e-6)


def test_halo_covers_all_stencils():
    halo = sh.required_halo(CHAIN, VETO)
    # candidate circle (2 cells @2.5*res) + longest walk (9) + chain reach
    assert halo >= 11


def test_mesh_factorization():
    m = sh.make_mesh(8)
    assert m.devices.shape in ((2, 4), (4, 2))
    assert m.axis_names == ("x", "y")
