"""Fused Pallas W-MSA kernel correctness (interpret mode on CPU)."""

import functools
import unittest.mock as mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from audio_residual_tpu.models.htsat import window_attention
from audio_residual_tpu.ops import windows as win_ops
from audio_residual_tpu.ops.pallas import window_attention as fwa


def _params(rng, c, nh):
    return {
        "qkv": {
            "kernel": rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.05,
            "bias": rng.standard_normal(3 * c).astype(np.float32) * 0.02,
        },
        "proj": {
            "kernel": rng.standard_normal((c, c)).astype(np.float32) * 0.05,
            "bias": rng.standard_normal(c).astype(np.float32) * 0.02,
        },
        "rel_bias_table": rng.standard_normal((225, nh)).astype(np.float32) * 0.02,
    }


@pytest.mark.parametrize("shift,res,g", [(0, (16, 16), 4), (4, (16, 16), 4), (4, (8, 8), 1)])
def test_fused_matches_xla(rng, shift, res, g):
    c, nh, b = 96, 4, 2
    p = _params(rng, c, nh)
    x = rng.standard_normal((b * g, 64, c)).astype(np.float32) * 0.5
    if shift > 0 and min(res) <= 8:
        shift_eff = 0 if min(res) <= 8 else shift
    else:
        shift_eff = shift
    mask = (
        jnp.asarray(win_ops.shift_window_mask(*res, 8, shift_eff)) if shift_eff > 0 else None
    )
    ref, _ = window_attention(p, jnp.asarray(x), nh, 8, mask)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = fwa.fused_window_attention(
            jnp.asarray(x), p["qkv"]["kernel"], p["qkv"]["bias"],
            p["proj"]["kernel"], p["proj"]["bias"], p["rel_bias_table"],
            nh, 8, g, shift_eff, res,
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_pick_group_budget():
    # HTSAT-tiny per-layer shapes all find a VMEM-feasible window group
    for nw, c, nh in [(64, 96, 4), (16, 192, 8), (4, 384, 16), (1, 768, 32)]:
        g = fwa.pick_group(nw, 64, c, nh)
        assert g is not None and nw % g == 0
        assert fwa._vmem_need(g, 64, c, nh) < fwa._VMEM_BUDGET


def test_fused_attention_grad_matches_xla(rng):
    """custom-vjp backward (XLA twin) produces correct gradients."""
    c, nh, g, b = 96, 4, 4, 1
    p = _params(rng, c, nh)
    x = jnp.asarray(rng.standard_normal((b * g, 64, c)).astype(np.float32) * 0.5)

    def loss_fused(x_):
        with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
            out = fwa.fused_window_attention(
                x_, p["qkv"]["kernel"], p["qkv"]["bias"],
                p["proj"]["kernel"], p["proj"]["bias"], p["rel_bias_table"],
                nh, 8, g, 4, (16, 16),
            )
        return jnp.sum(out**2)

    def loss_xla(x_):
        mask = jnp.asarray(win_ops.shift_window_mask(16, 16, 8, 4))
        out, _ = window_attention(p, x_, nh, 8, mask)
        return jnp.sum(out**2)

    g1 = jax.grad(loss_fused)(x)
    g2 = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-3, rtol=1e-2)


def _block_params(rng, c=96, nh=4, hidden=384):
    blk = {
        "norm1": {"scale": jnp.ones(c) * 1.1, "bias": jnp.ones(c) * 0.01},
        "attn": {
            "qkv": {"kernel": jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.05),
                    "bias": jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.02)},
            "proj": {"kernel": jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.05),
                     "bias": jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.02)},
            "rel_bias_table": jnp.asarray(rng.standard_normal((225, nh)).astype(np.float32) * 0.02),
        },
        "norm2": {"scale": jnp.ones(c) * 0.9, "bias": jnp.zeros(c)},
        "mlp": {"fc1": {"kernel": jnp.asarray(rng.standard_normal((c, hidden)).astype(np.float32) * 0.05),
                        "bias": jnp.zeros(hidden)},
                "fc2": {"kernel": jnp.asarray(rng.standard_normal((hidden, c)).astype(np.float32) * 0.05),
                        "bias": jnp.zeros(c)}},
    }
    flat = (blk["norm1"]["scale"], blk["norm1"]["bias"],
            blk["attn"]["qkv"]["kernel"], blk["attn"]["qkv"]["bias"],
            blk["attn"]["proj"]["kernel"], blk["attn"]["proj"]["bias"],
            blk["norm2"]["scale"], blk["norm2"]["bias"],
            blk["mlp"]["fc1"]["kernel"], blk["mlp"]["fc1"]["bias"],
            blk["mlp"]["fc2"]["kernel"], blk["mlp"]["fc2"]["bias"],
            blk["attn"]["rel_bias_table"])
    return blk, flat


@pytest.mark.parametrize("use_res,dffn", [(False, False), (True, False), (True, True)])
def test_fused_block_matches_twin(rng, use_res, dffn):
    from audio_residual_tpu.ops.pallas import swin_block as fsb

    c, nh, g, b = 96, 4, 4, 2
    blk, flat = _block_params(rng, c, nh)
    q, _ = np.linalg.qr(rng.standard_normal((c, c)))
    rparams = {"basis": jnp.asarray(q.astype(np.float32)),
               "mean": jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.01),
               "lam": jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((b * g, 64, c)).astype(np.float32) * 0.5)
    fp = flat + ((rparams["basis"], rparams["mean"], rparams["lam"]) if use_res else ())
    ref = fsb._xla_twin(x, blk, rparams if use_res else None, nh=nh, window=8, nw=g,
                        shift=4, resolution=(16, 16), double_ffn=dffn)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = fsb.fused_swin_block(x, fp, nh, 8, g, 4, (16, 16), use_res, dffn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-3)


def test_fused_block_grad(rng):
    from audio_residual_tpu.ops.pallas import swin_block as fsb

    c, nh, g = 96, 4, 4
    blk, flat = _block_params(rng, c, nh)
    x = jnp.asarray(rng.standard_normal((g, 64, c)).astype(np.float32) * 0.5)

    def loss_fused(x_):
        with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
            return jnp.sum(fsb.fused_swin_block(x_, flat, nh, 8, g, 4, (16, 16), False, False) ** 2)

    def loss_twin(x_):
        return jnp.sum(fsb._xla_twin(x_, blk, None, nh=nh, window=8, nw=g,
                                     shift=4, resolution=(16, 16), double_ffn=False) ** 2)

    g1 = jax.grad(loss_fused)(x)
    g2 = jax.grad(loss_twin)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=5e-3, rtol=1e-2)


def test_block_vmem_budget():
    from audio_residual_tpu.ops.pallas import swin_block as fsb

    # HTSAT-tiny layers 0-2 fit; layer 3 (768-wide MLP) must NOT
    assert fsb.block_supports(64, 64, 96, 4, 384)
    assert fsb.block_supports(16, 64, 192, 8, 768)
    assert fsb.block_supports(4, 64, 384, 16, 1536)
    assert not fsb.block_supports(1, 64, 768, 32, 3072)


def test_fused_frontend_matches_rfft(rng):
    from audio_residual_tpu.ops import frontend as fe
    from audio_residual_tpu.ops.pallas import frontend as pfe

    cfg = fe.FrontendConfig()
    wav = jnp.asarray((rng.standard_normal((2, 24000)) * 0.1).astype(np.float32))
    ref = fe.logmel(wav, cfg)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = pfe.fused_logmel(wav, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)
