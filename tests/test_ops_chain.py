"""Device filter chain vs NumPy oracle (and golden) — numerics gate."""

import numpy as np
import jax.numpy as jnp
import pytest

from traversability_estimation_tpu.ops import filters as DF
from traversability_estimation_tpu.oracle import filters as OF

LAYERS = [
    "traversability_slope",
    "traversability_step",
    "traversability_roughness",
    "traversability",
]


def _compare(elev, resolution, atol):
    out = DF.run_chain_jit(jnp.asarray(elev), DF.ChainConfig(resolution=resolution))
    ref = OF.run_chain(elev, resolution, OF.DEFAULT_CHAIN_CONFIG, (0.0, 0.0))
    for layer in LAYERS:
        o = np.asarray(out[layer])
        r = ref[layer]
        assert np.isfinite(o).sum() == np.isfinite(r).sum(), layer
        both = np.isfinite(o) & np.isfinite(r)
        assert both.sum() == np.isfinite(r).sum(), layer  # same NaN pattern
        if both.any():
            # roughness amplifies f32 rounding: d sqrt(x) ~ dx / (2 sqrt(x))
            # near x=0, then division by critical_value=0.05 scales 20x
            tol = atol * 5 if layer == "traversability_roughness" else atol
            assert np.abs(o[both] - r[both]).max() < tol, layer


def test_chain_matches_oracle_on_golden(golden_map):
    _compare(golden_map.data["elevation"], golden_map.resolution, 5e-5)


def test_chain_matches_oracle_synthetic_with_nans(terrain):
    elev = terrain(48, 64, 0.03, seed=3, nan_frac=0.15)
    _compare(elev, 0.03, 5e-5)


def test_chain_matches_oracle_coarse_resolution(terrain):
    # BASELINE.json config 1 uses 0.06 m resolution
    elev = terrain(40, 40, 0.06, seed=5, nan_frac=0.05)
    _compare(elev, 0.06, 5e-5)


def test_chain_shift_invariance():
    # moments are accumulated in local coordinates: adding a large constant
    # altitude must not change the result beyond f32 noise
    rng = np.random.default_rng(7)
    elev = (0.05 * rng.standard_normal((32, 32))).astype(np.float32)
    cfg = DF.ChainConfig(resolution=0.03)
    a = DF.run_chain_jit(jnp.asarray(elev), cfg)
    b = DF.run_chain_jit(jnp.asarray(elev + np.float32(512.0)), cfg)
    for layer in LAYERS:
        x, y = np.asarray(a[layer]), np.asarray(b[layer])
        both = np.isfinite(x) & np.isfinite(y)
        assert np.abs(x[both] - y[both]).max() < 2e-2  # f32 elevation quantization

    c = DF.run_chain_jit(jnp.asarray(elev + np.float32(0.0)), cfg)
    for layer in LAYERS:
        np.testing.assert_array_equal(np.asarray(a[layer]), np.asarray(c[layer]))


def test_eigensolver_accuracy():
    import jax

    rng = np.random.default_rng(0)
    A = rng.standard_normal((512, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, -1, -2)
    emin, emid, v = jax.jit(DF.smallest_eigpair_sym3)(jnp.asarray(A))
    w, V = np.linalg.eigh(A)
    assert np.abs(np.asarray(emin) - w[:, 0]).max() < 1e-5 * np.abs(w).max()
    dots = np.abs(np.sum(np.asarray(v) * V[:, :, 0], axis=-1))
    assert dots.min() > 1.0 - 1e-5


def test_nan_propagation():
    elev = np.full((20, 20), np.nan, dtype=np.float32)
    out = DF.run_chain_jit(jnp.asarray(elev), DF.ChainConfig(resolution=0.03))
    # slope/roughness NaN everywhere (no valid centers); step NaN everywhere
    # (no valid step_height in any window)
    for layer in LAYERS:
        assert not np.isfinite(np.asarray(out[layer])).any(), layer
