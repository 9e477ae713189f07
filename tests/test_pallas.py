"""Fused Pallas kernel parity (interpret mode on CPU; compiled path is
exercised on real TPU by bench/verification runs)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl

from traversability_estimation_tpu.ops import pallas_chain as pc
from traversability_estimation_tpu.ops.filters import ChainConfig, run_chain_jit
from traversability_estimation_tpu.ops.veto import VetoConfig, compute_veto_fields_jit


@pytest.mark.slow
def test_fused_update_matches_xla(terrain, monkeypatch):
    res = 0.03
    elev = terrain(96, 96, res, seed=61, nan_frac=0.08)
    ccfg = ChainConfig(resolution=res)
    vcfg = VetoConfig(resolution=res, check_roughness=True)

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    out = pc.fused_update.__wrapped__(jnp.asarray(elev), ccfg, vcfg, (48, 128))

    ref = run_chain_jit(jnp.asarray(elev), ccfg)
    refv = compute_veto_fields_jit(
        {
            "elevation": jnp.asarray(elev),
            "traversability_slope": ref["traversability_slope"],
            "traversability_step": ref["traversability_step"],
            "traversability_roughness": ref["traversability_roughness"],
        },
        vcfg,
    )
    for k in (
        "traversability",
        "traversability_slope",
        "traversability_step",
        "traversability_roughness",
    ):
        a, b = np.asarray(out[k]), np.asarray(ref[k])
        assert (np.isfinite(a) == np.isfinite(b)).all(), k
        both = np.isfinite(a) & np.isfinite(b)
        np.testing.assert_allclose(a[both], b[both], atol=1e-6, err_msg=k)
    np.testing.assert_array_equal(
        np.asarray(out["traversable_mask"]), np.asarray(refv["traversable_mask"])
    )
