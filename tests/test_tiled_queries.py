"""Tiled (unreplicated-map) query tests: pmin/psum verdict reduction.

The large-map scaling mode computes the dense circle field per tile with
halo exchange and answers path batches with every device sampling its own
tile + one psum over the mesh. Both must be bit-identical to the unsharded
evaluators (single-pose paths excepted — documented cell-center deviation).
Runs on the 8-virtual-device CPU mesh from conftest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import synthetic_terrain
from traversability_estimation_tpu.ops import footprint as fp_ops
from traversability_estimation_tpu.parallel import sharding as sh

RES = 0.03


@pytest.fixture(scope="module")
def setup():
    mesh = sh.make_mesh()
    assert mesh.devices.size == 8
    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.ops.veto import VetoConfig

    ccfg = ChainConfig(resolution=RES)
    vcfg = VetoConfig(resolution=RES, check_roughness=False)
    gx, gy = mesh.devices.shape
    H, W = 30 * gx, 30 * gy  # uneven vs tile to exercise cross-tile spirals
    elev = synthetic_terrain(H, W, RES, seed=6, nan_frac=0.03)
    layers = sh.sharded_update(jnp.asarray(elev), ccfg, vcfg, mesh)
    state = fp_ops.QueryState(
        traversability=jax.device_get(layers["traversability"]),
        traversable_mask=jax.device_get(layers["traversable_mask"]),
        position=jnp.zeros((2,), jnp.float32),
        resolution=RES,
        default_traversability=0.5,
    )
    return mesh, layers, state, (H, W)


RADIUS, OFFSET = 0.12, 0.06


def test_sharded_circle_field_matches_unsharded(setup):
    mesh, layers, state, _ = setup
    ok_t, tv_t = sh.sharded_circle_field(
        layers, mesh, RADIUS + OFFSET, RADIUS, RES, 0.5
    )
    ok_r, tv_r = fp_ops.dense_circle_field(state, RADIUS + OFFSET, RADIUS)
    np.testing.assert_array_equal(np.asarray(ok_t), np.asarray(ok_r))
    np.testing.assert_array_equal(np.asarray(tv_t), np.asarray(tv_r))


def test_tiled_paths_match_local(setup):
    mesh, layers, state, (H, W) = setup
    rng = np.random.default_rng(11)
    P, N = 64, 6
    extent_x, extent_y = H * RES / 2, W * RES / 2
    starts = np.stack(
        [rng.uniform(-extent_x, extent_x, P), rng.uniform(-extent_y, extent_y, P)],
        -1,
    )
    steps = rng.uniform(-0.15, 0.15, (P, N - 1, 2))  # long segs cross tiles
    poses = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    ).astype(np.float32)
    n_poses = rng.integers(2, N + 1, P).astype(np.int32)
    max_cells = 64

    field = sh.sharded_circle_field(layers, mesh, RADIUS + OFFSET, RADIUS, RES, 0.5)
    safe_t, trav_t = sh.check_circular_paths_tiled(
        field[0], field[1], poses, n_poses, mesh, (0.0, 0.0), RES, max_cells
    )

    field_ref = fp_ops.dense_circle_field(state, RADIUS + OFFSET, RADIUS)
    safe_r, trav_r = fp_ops.check_circular_paths(
        state, poses, n_poses, RADIUS, OFFSET, max_cells, field_ref, False
    )
    np.testing.assert_array_equal(np.asarray(safe_t), np.asarray(safe_r))
    np.testing.assert_allclose(
        np.asarray(trav_t), np.asarray(trav_r), rtol=0, atol=0
    )


def test_tiled_paths_offmap_default(setup):
    mesh, layers, state, (H, W) = setup
    far = 100.0
    poses = np.asarray(
        [[[far, far], [far + 0.1, far]]], np.float32
    )
    field = sh.sharded_circle_field(layers, mesh, RADIUS + OFFSET, RADIUS, RES, 0.5)
    safe, trav = sh.check_circular_paths_tiled(
        field[0], field[1], poses, np.array([2], np.int32), mesh,
        (0.0, 0.0), RES, 16,
    )
    # every sample off-map -> default verdict & score (cpp:662-667)
    assert bool(np.asarray(safe)[0]) is True
    assert np.asarray(trav)[0] == pytest.approx(0.5)


@pytest.mark.slow
def test_tiled_polygonal_paths_match_local(setup):
    mesh, layers, state, (H, W) = setup
    rng = np.random.default_rng(21)
    P, N = 32, 5
    footprint = np.array(
        [[0.12, 0.08], [0.12, -0.08], [-0.12, -0.08], [-0.12, 0.08]], np.float32
    )
    extent_x, extent_y = H * RES / 2, W * RES / 2
    starts = np.stack(
        [rng.uniform(-extent_x, extent_x, P), rng.uniform(-extent_y, extent_y, P)],
        -1,
    )
    steps = rng.uniform(-0.12, 0.12, (P, N - 1, 2))
    poses2 = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    )
    yaws = rng.uniform(0, 2 * np.pi, (P, N))
    pos3 = np.concatenate([poses2, np.zeros((P, N, 1))], -1).astype(np.float32)
    quats = np.zeros((P, N, 4), np.float32)
    quats[..., 2] = np.sin(yaws / 2)
    quats[..., 3] = np.cos(yaws / 2)
    n_poses = rng.integers(1, N + 1, P).astype(np.int32)

    for conservative in (False, True):
        window = fp_ops.polygon_window_cells(footprint, 0.25, RES, conservative)
        safe_t, trav_t, area_t = sh.check_polygonal_paths_tiled(
            {
                "traversability": layers["traversability"],
                "traversable_mask": layers["traversable_mask"],
            },
            pos3, quats, n_poses,
            tuple(map(tuple, footprint.tolist())),
            mesh, window, conservative, (0.0, 0.0), RES, 0.5,
        )
        safe_r, trav_r, area_r = fp_ops.check_polygonal_paths(
            state, pos3, quats, n_poses, footprint, window, conservative
        )
        np.testing.assert_array_equal(np.asarray(safe_t), np.asarray(safe_r))
        np.testing.assert_allclose(
            np.asarray(trav_t), np.asarray(trav_r), rtol=0, atol=2e-6
        )
        np.testing.assert_allclose(
            np.asarray(area_t), np.asarray(area_r), rtol=1e-5, atol=1e-7
        )


def test_tiled_single_pose_cell_center(setup):
    mesh, layers, state, (H, W) = setup
    rng = np.random.default_rng(3)
    P = 16
    centers = np.stack(
        [rng.uniform(-0.3, 0.3, P), rng.uniform(-0.3, 0.3, P)], -1
    ).astype(np.float32)
    poses = np.concatenate([centers[:, None], centers[:, None]], 1)
    n_poses = np.ones((P,), np.int32)
    field = sh.sharded_circle_field(layers, mesh, RADIUS + OFFSET, RADIUS, RES, 0.5)
    safe, trav = sh.check_circular_paths_tiled(
        field[0], field[1], poses, n_poses, mesh, (0.0, 0.0), RES, 16
    )
    # documented deviation: single-pose scored from the field at the CELL
    # CENTER — compare against the field lookup directly
    ok_r, tv_r = (np.asarray(a) for a in field)
    p0 = np.array([H, W]) * RES / 2
    idx = np.floor((p0 - centers) / RES).astype(int)
    exp_ok = ok_r[idx[:, 0], idx[:, 1]]
    exp_tv = np.where(exp_ok, tv_r[idx[:, 0], idx[:, 1]], 0.0)
    np.testing.assert_array_equal(np.asarray(safe), exp_ok)
    np.testing.assert_allclose(np.asarray(trav), exp_tv, atol=0)


def test_sharded_online_tick_matches_unsharded(setup):
    """sharded_online_tick (merge + tiled re-filter + tiled field + psum
    query, one program) must equal the single-device sequence on the same
    inputs — the multi-chip form of BASELINE config 4."""
    mesh, _layers, _state, (H, W) = setup
    from traversability_estimation_tpu.models.estimator import _update_step
    from traversability_estimation_tpu.ops.filters import ChainConfig
    from traversability_estimation_tpu.ops.veto import VetoConfig

    ccfg = ChainConfig(resolution=RES)
    vcfg = VetoConfig(resolution=RES, check_roughness=False)
    rng = np.random.default_rng(21)
    elev = synthetic_terrain(H, W, RES, seed=13, nan_frac=0.03)
    patch = (0.1 * rng.standard_normal((24, 24))).astype(np.float32)
    mi, mj = 31, 57  # straddles tile boundaries of the 2x4 mesh

    elev_dev = jax.device_put(
        jnp.asarray(elev),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("x", "y")),
    )
    P_, N = 32, 5
    ex, ey = H * RES / 2, W * RES / 2
    starts = np.stack(
        [rng.uniform(-ex, ex, P_), rng.uniform(-ey, ey, P_)], -1
    )
    steps = rng.uniform(-0.12, 0.12, (P_, N - 1, 2))
    poses = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    ).astype(np.float32)
    n_poses = rng.integers(2, N + 1, P_).astype(np.int32)

    elev2, layers, safe_t, trav_t = sh.sharded_online_tick(
        elev_dev, jnp.asarray(patch), jnp.asarray([mi, mj], jnp.int32),
        jnp.asarray(poses), jnp.asarray(n_poses),
        mesh=mesh, chain_cfg=ccfg, veto_cfg=vcfg, radius=RADIUS,
        offset=OFFSET, resolution=RES, max_segment_cells=64,
    )

    # unsharded reference on the merged map
    merged = np.array(elev)
    merged[mi : mi + 24, mj : mj + 24] = patch
    np.testing.assert_array_equal(
        np.asarray(elev2), merged, err_msg="sharded merge differs"
    )
    ref_layers = _update_step(jnp.asarray(merged), ccfg, vcfg)
    a = np.asarray(layers["traversability"])
    b = np.asarray(ref_layers["traversability"])
    # same tolerance as test_sharding: FMA contraction differs between the
    # tiled and whole-map fusion contexts by <=1 ulp
    assert (np.isfinite(a) == np.isfinite(b)).all()
    both = np.isfinite(a) & np.isfinite(b)
    np.testing.assert_allclose(a[both], b[both], atol=3e-7)
    state = fp_ops.QueryState(
        traversability=ref_layers["traversability"],
        traversable_mask=ref_layers["traversable_mask"],
        position=jnp.zeros((2,), jnp.float32),
        resolution=RES,
        default_traversability=0.5,
    )
    field = fp_ops.dense_circle_field(state, RADIUS + OFFSET, RADIUS)
    safe_r, trav_r = fp_ops.check_circular_paths(
        state, poses, n_poses, RADIUS, OFFSET, 64, field, has_single_pose=False
    )
    np.testing.assert_array_equal(np.asarray(safe_t), np.asarray(safe_r))
    np.testing.assert_allclose(
        np.asarray(trav_t), np.asarray(trav_r), atol=1e-6
    )


def test_tiled_paths_sharded_raster_matches_local(setup):
    # Forces the large-batch branch of check_circular_paths_tiled (pose
    # batch divides the mesh AND raster_work >= 2**18): the Bresenham
    # expansion runs inside an explicit shard_map over the pose axis and
    # only the subsampled cells are all-gathered. Results must stay
    # bit-identical to the unsharded evaluator.
    mesh, layers, state, (H, W) = setup
    rng = np.random.default_rng(13)
    P, N = 256, 9
    max_cells = 128
    assert P % mesh.devices.size == 0
    assert P * (N - 1) * max_cells >= 1 << 18
    extent_x, extent_y = H * RES / 2, W * RES / 2
    starts = np.stack(
        [rng.uniform(-extent_x, extent_x, P), rng.uniform(-extent_y, extent_y, P)],
        -1,
    )
    steps = rng.uniform(-0.15, 0.15, (P, N - 1, 2))
    poses = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    ).astype(np.float32)
    n_poses = rng.integers(1, N + 1, P).astype(np.int32)
    # keep single-pose paths out (documented cell-center deviation)
    n_poses[n_poses < 2] = 2

    field = sh.sharded_circle_field(layers, mesh, RADIUS + OFFSET, RADIUS, RES, 0.5)
    safe_t, trav_t = sh.check_circular_paths_tiled(
        field[0], field[1], poses, n_poses, mesh, (0.0, 0.0), RES, max_cells
    )
    field_ref = fp_ops.dense_circle_field(state, RADIUS + OFFSET, RADIUS)
    safe_r, trav_r = fp_ops.check_circular_paths(
        state, poses, n_poses, RADIUS, OFFSET, max_cells, field_ref, False
    )
    np.testing.assert_array_equal(np.asarray(safe_t), np.asarray(safe_r))
    np.testing.assert_array_equal(np.asarray(trav_t), np.asarray(trav_r))


def test_tiled_paths_path_reduce_matches_local(setup, monkeypatch):
    """Round-5 per-PATH partial psum (body_paths): above the sample
    threshold the tiled query reduces samples -> paths before the psum
    (O(P) bytes on the wire instead of O(P*N*S)). Verdicts must be exact;
    traversability may differ from the local evaluator only by summation
    re-association (owner-grouped order) — a few ulps."""
    mesh, layers, state, (H, W) = setup
    rng = np.random.default_rng(29)
    P, N = 512, 9
    max_cells = 128
    # force the new mode regardless of the shipped threshold
    monkeypatch.setattr(sh, "_PATH_REDUCE_SAMPLES", 1)
    extent_x, extent_y = H * RES / 2, W * RES / 2
    starts = np.stack(
        [rng.uniform(-1.3 * extent_x, 1.3 * extent_x, P),
         rng.uniform(-1.3 * extent_y, 1.3 * extent_y, P)],
        -1,
    )  # 1.3x: some paths wander off-map to exercise the default verdict
    steps = rng.uniform(-0.15, 0.15, (P, N - 1, 2))
    poses = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    ).astype(np.float32)
    n_poses = rng.integers(2, N + 1, P).astype(np.int32)

    field = sh.sharded_circle_field(layers, mesh, RADIUS + OFFSET, RADIUS, RES, 0.5)
    safe_t, trav_t = sh.check_circular_paths_tiled(
        field[0], field[1], poses, n_poses, mesh, (0.0, 0.0), RES, max_cells
    )
    field_ref = fp_ops.dense_circle_field(state, RADIUS + OFFSET, RADIUS)
    safe_r, trav_r = fp_ops.check_circular_paths(
        state, poses, n_poses, RADIUS, OFFSET, max_cells, field_ref, False
    )
    np.testing.assert_array_equal(np.asarray(safe_t), np.asarray(safe_r))
    np.testing.assert_allclose(
        np.asarray(trav_t), np.asarray(trav_r), rtol=0, atol=3e-6
    )
    # a few single-pose paths through the same mode (cell-center rule)
    n1 = np.ones((P,), np.int32)
    safe_1, trav_1 = sh.check_circular_paths_tiled(
        field[0], field[1], poses, n1, mesh, (0.0, 0.0), RES, max_cells
    )
    assert np.asarray(safe_1).shape == (P,)


def test_tiled_polygonal_row_reduce_matches_local(setup, monkeypatch):
    """Polygonal analog of the per-path partial psum: above the threshold
    the span scorer sums rows -> polygons before the psum. Verdicts and
    cell counts are exact (packed int rows sum exactly in any order);
    traversability allclose (f32 score sum reorders device-grouped)."""
    mesh, layers, state, (H, W) = setup
    rng = np.random.default_rng(31)
    fp = np.array(
        [[0.1, 0.06], [0.1, -0.06], [-0.1, -0.06], [-0.1, 0.06]], np.float32
    )
    P, N = 48, 5
    starts = np.stack(
        [rng.uniform(-0.8, 0.8, P), rng.uniform(-0.8, 0.8, P)], -1
    )
    steps = rng.uniform(-0.1, 0.1, (P, N - 1, 2))
    poses2 = np.concatenate(
        [starts[:, None], starts[:, None] + np.cumsum(steps, 1)], 1
    )
    pos3 = np.concatenate([poses2, np.zeros((P, N, 1))], -1).astype(np.float32)
    yaws = rng.uniform(0, 2 * np.pi, (P, N))
    quats = np.zeros((P, N, 4), np.float32)
    quats[..., 2] = np.sin(yaws / 2)
    quats[..., 3] = np.cos(yaws / 2)
    n_poses = rng.integers(1, N + 1, P).astype(np.int32)

    window = fp_ops.polygon_window_cells(fp, 0.35, RES, False, False)
    fp_t = tuple(map(tuple, fp.tolist()))
    args = (
        jnp.asarray(pos3), jnp.asarray(quats), jnp.asarray(n_poses),
    )
    base = sh.check_polygonal_paths_tiled(
        layers, *args, fp_t, mesh, window, False, (0.0, 0.0), RES, 0.5, (H, W)
    )
    monkeypatch.setattr(sh, "_PATH_REDUCE_SAMPLES", 1)
    got = sh.check_polygonal_paths_tiled.__wrapped__(
        layers, *args, fp_t, mesh, window, False, (0.0, 0.0), RES, 0.5, (H, W)
    )
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(got[0]))
    np.testing.assert_allclose(
        np.asarray(base[1]), np.asarray(got[1]), rtol=0, atol=3e-6
    )
    np.testing.assert_array_equal(np.asarray(base[2]), np.asarray(got[2]))
    # referee: local per-segment evaluator
    ref = fp_ops.check_polygonal_paths(
        state, jnp.asarray(pos3), jnp.asarray(quats), jnp.asarray(n_poses),
        jnp.asarray(fp), window, False, False,
    )
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(ref[1]), atol=3e-6
    )
