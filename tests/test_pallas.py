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


def test_head_group_packing_exact(rng, monkeypatch):
    """hg=4 lane-packed attention (block-masked wide K/V) == the plain
    per-head loop bit-for-bit modulo accumulation order — both fused-kernel
    paths stay covered whatever pick_head_group auto-selects."""
    c, nh, b, g = 96, 4, 2, 4
    p = _params(rng, c, nh)
    x = jnp.asarray(rng.standard_normal((b * g, 64, c)).astype(np.float32) * 0.5)
    outs = {}
    for hg in ("1", "4"):
        monkeypatch.setenv("ARPU_ATTN_HG", hg)
        with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
            outs[hg] = np.asarray(
                fwa.fused_window_attention(
                    x, p["qkv"]["kernel"], p["qkv"]["bias"],
                    p["proj"]["kernel"], p["proj"]["bias"], p["rel_bias_table"],
                    nh, 8, g, 4, (16, 16),
                )
            )
    np.testing.assert_allclose(outs["4"], outs["1"], atol=2e-5, rtol=1e-5)


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


def test_pick_head_group_gate():
    """The measured head-group gate (PERF.md): hg=4 for nh<=16 HTSAT heads
    (hd=24, n=64) under AMP, hg=1 at L3 (nh=32, where packing measured 3x
    worse), whenever the packed width exceeds one MXU contraction tile —
    and ALWAYS 1 on the golden mxu_dtype=None path, where the packed
    softmax's group-global max + denom floor would be a semantic deviation
    (ADVICE r3)."""
    from audio_residual_tpu.ops.pallas import common as pc

    bf16 = jnp.bfloat16
    assert pc.pick_head_group(4, 24, 64, bf16) == 4    # tiny L0 (AMP)
    assert pc.pick_head_group(8, 24, 64, bf16) == 4    # L1
    assert pc.pick_head_group(16, 24, 64, bf16) == 4   # L2
    assert pc.pick_head_group(32, 24, 64, bf16) == 1   # L3: gated off
    assert pc.pick_head_group(4, 64, 64, bf16) == 2    # 4*64 > 128 lanes -> hg=2
    assert pc.pick_head_group(3, 24, 64, bf16) == 1    # indivisible head count
    # golden path: packing never auto-selects
    for nh, hd in [(4, 24), (8, 24), (16, 24), (32, 24)]:
        assert pc.pick_head_group(nh, hd, 64, None) == 1
    import os
    from unittest import mock as _mock

    with _mock.patch.dict(os.environ, {"ARPU_ATTN_HG": "2"}):
        assert pc.pick_head_group(4, 24, 64, bf16) == 2  # A/B override
        # hg>1 never reaches the golden path, even explicitly: the packed
        # softmax deviation must not leak into the exact path the bench
        # accuracy guard compares against
        assert pc.pick_head_group(4, 24, 64, None) == 1
    with _mock.patch.dict(os.environ, {"ARPU_ATTN_HG": "1"}):
        assert pc.pick_head_group(4, 24, 64, bf16) == 1  # "1" honored anywhere
        assert pc.pick_head_group(4, 24, 64, None) == 1
    with _mock.patch.dict(os.environ, {"ARPU_ATTN_HG": "3"}):
        assert pc.pick_head_group(4, 24, 64, bf16) == 1  # invalid -> plain loop
    with _mock.patch.dict(os.environ, {"ARPU_ATTN_HG": "true"}):
        assert pc.pick_head_group(4, 24, 64, bf16) == 1  # malformed -> plain loop
    with _mock.patch.dict(os.environ, {"ARPU_ATTN_HG": "4"}):
        assert pc.pick_head_group(4, 64, 64, bf16) == 1  # 4*64 > 128 lanes rejected


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


@pytest.mark.parametrize(
    "use_res,dffn",
    # (False, True) included: double_ffn_compat defaults to True and must be
    # a no-op without residual injection (the quirk lives in the reference's
    # PATCHED forward only, `src/residual.py:92-96`)
    [(False, False), (False, True), (True, False), (True, True)],
)
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

    # HTSAT-tiny layers 0-2 fit the monolithic kernel
    assert fsb.block_supports(64, 64, 96, 4, 384)
    assert fsb.block_supports(16, 64, 192, 8, 768)
    assert fsb.block_supports(4, 64, 384, 16, 1536)
    # layer 3 (768-wide MLP, 19 MB of weights) exceeds the monolithic VMEM
    # budget but is served by the split plan (W-MSA kernel + chunked FFN)
    assert fsb.block_pick_group(1, 64, 768, 32, 3072) is None
    assert fsb.block_supports(1, 64, 768, 32, 3072)


@pytest.mark.parametrize("use_res,dffn", [(False, False), (True, False), (True, True)])
def test_fused_residual_ffn_matches_xla(rng, use_res, dffn):
    """Hidden-chunked FFN kernel == the XLA formula, with the chunk loop
    forced (small VMEM budget) so the accumulation + double-FFN phase logic
    is exercised."""
    from audio_residual_tpu.ops.pallas import ln_mlp

    rows, c, hidden = 128, 96, 384
    x = jnp.asarray(rng.standard_normal((rows, c)).astype(np.float32) * 0.5)
    a = jnp.asarray(rng.standard_normal((rows, c)).astype(np.float32) * 0.1)
    n2s = jnp.ones(c) * 0.9
    n2b = jnp.zeros(c)
    wfc1 = jnp.asarray(rng.standard_normal((c, hidden)).astype(np.float32) * 0.05)
    bfc1 = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.02)
    wfc2 = jnp.asarray(rng.standard_normal((hidden, c)).astype(np.float32) * 0.05)
    bfc2 = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.02)
    q, _ = np.linalg.qr(rng.standard_normal((c, c)))
    rparams = (
        {"basis": jnp.asarray(q.astype(np.float32)),
         "mean": jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.01),
         "lam": jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))}
        if use_res else None
    )

    def xla_ffn(t):
        z = (t - jnp.mean(t, -1, keepdims=True)) * jax.lax.rsqrt(
            jnp.var(t, -1, keepdims=True) + 1e-5) * n2s + n2b
        return jax.nn.gelu(z @ wfc1 + bfc1, approximate=False) @ wfc2 + bfc2

    a_ref = a
    if use_res:
        a_ref = ((a - rparams["mean"]) @ rparams["basis"].T * rparams["lam"]) @ rparams["basis"]
    h1 = x + a_ref
    ref = h1 + xla_ffn(h1)
    if dffn:
        y2 = x + ref
        ref = y2 + xla_ffn(y2)

    small_budget = ln_mlp._vmem_need(64, c, hidden // 2, c if use_res else 0) + 1
    with mock.patch.object(ln_mlp, "_VMEM_BUDGET", small_budget), \
         mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        plan = ln_mlp.ffn_plan(rows, c, hidden, c if use_res else 0)
        assert plan is not None and plan[1] < hidden, plan  # chunking forced
        got = ln_mlp.fused_residual_ffn(
            x, a, n2s, n2b, wfc1, bfc1, wfc2, bfc2, rparams, double_ffn=dffn
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize(
    "use_res,dffn",
    [(False, False), (False, True), (True, False), (True, True)],
)
def test_split_block_matches_twin(rng, use_res, dffn):
    """The split plan (attention kernel + chunked FFN kernel) == the XLA twin
    when the monolithic kernel is forced out of budget. (False, True) guards
    the default-eval regression: double_ffn_compat=True must not double the
    FFN on layers without an injected residual."""
    from audio_residual_tpu.ops.pallas import swin_block as fsb

    c, nh, g, b = 96, 4, 4, 2
    blk, flat = _block_params(rng, c, nh)
    q, _ = np.linalg.qr(rng.standard_normal((c, c)))
    rparams = {"basis": jnp.asarray(q.astype(np.float32)),
               "mean": jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.01),
               "lam": jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((b * g, 64, c)).astype(np.float32) * 0.5)
    fp = flat + ((rparams["basis"], rparams["mean"], rparams["lam"]) if use_res else ())
    ref = fsb._xla_twin(x, blk, rparams if use_res else None, nh=nh, window=8,
                        nw=g, shift=4, resolution=(16, 16), double_ffn=dffn)
    with mock.patch.object(fsb, "_VMEM_BUDGET", 1), \
         mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        assert fsb.block_pick_group(g, 64, c, nh, 384) is None
        got = fsb.fused_swin_block(x, fp, nh, 8, g, 4, (16, 16), use_res, dffn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-3)


@pytest.mark.parametrize("xdtype", [jnp.bfloat16, jnp.float32])
def test_split_block_amp_output_dtype_contract(rng, xdtype):
    """Under AMP every fused path returns the CALLER's activation dtype —
    the split plan included. o_ref inside the chunked-FFN kernel is an f32
    cross-chunk accumulator, so the contract is restored by a post-call
    cast; before round 5 the split plan leaked f32 outputs into the bf16
    AMP layer loop (caught on real Mosaic by the drive's layer3_split bf16
    arm, which interpret-mode tests missed for want of this assert)."""
    from audio_residual_tpu.ops.pallas import swin_block as fsb

    c, nh, g = 96, 4, 4
    _, flat = _block_params(rng, c, nh)
    x = jnp.asarray(rng.standard_normal((g, 64, c)).astype(np.float32) * 0.5)
    x = x.astype(xdtype)
    with mock.patch.object(fsb, "_VMEM_BUDGET", 1), \
         mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = fsb.fused_swin_block(x, flat, nh, 8, g, 0, (16, 16), False,
                                   False, jnp.bfloat16)
    assert got.dtype == xdtype


@pytest.mark.parametrize(
    "c,nh,hidden",
    [
        (128, 4, 512),     # HTSAT-base layer 0 (hd=32), monolithic kernel
        (256, 4, 1024),    # HTSAT-large layer 0 (hd=64)
        # base/large layers 2-3 (c >= 1024): wqkv alone is >= 12.6 MB, so
        # the split plan routes attention through the weight-streaming wide
        # kernel + the hidden-chunked FFN kernel
        (1024, 32, 4096),
        (2048, 32, 8192),
    ],
)
def test_fused_block_base_large_shapes(rng, c, nh, hidden):
    """Base/large model-family layer shapes — head dims and widths the
    tiny-config tests never exercise; c >= 1024 exercises the
    weight-streaming wide attention kernel."""
    from audio_residual_tpu.ops.pallas import swin_block as fsb
    from audio_residual_tpu.ops.pallas import window_attention as fwa

    nw, res = 4, (16, 16)
    blk, flat = _block_params(rng, c, nh, hidden)
    assert fsb.block_supports(nw, 64, c, nh, hidden, 0)
    if fwa.pick_group(nw, 64, c, nh) is None:
        assert fwa.wide_plan(nw, 64, c, nh) is not None
    x = jnp.asarray(rng.standard_normal((1 * nw, 64, c)).astype(np.float32) * 0.5)
    ref = fsb._xla_twin(x, blk, None, nh=nh, window=8, nw=nw, shift=4,
                        resolution=res, double_ffn=False)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = fsb.fused_swin_block(x, flat, nh, 8, nw, 4, res, False, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_fused_block_bf16_mxu(rng):
    """``mxu_dtype=bfloat16`` (the TPU analog of the reference's AMP
    inference) keeps the block's output within bf16-mantissa error of the
    f32 path — monolithic kernel and forced split plan both."""
    from audio_residual_tpu.ops.pallas import ln_mlp
    from audio_residual_tpu.ops.pallas import swin_block as fsb

    c, nh, g, b = 96, 4, 4, 2
    blk, flat = _block_params(rng, c, nh)
    q, _ = np.linalg.qr(rng.standard_normal((c, c)))
    rparams = {"basis": jnp.asarray(q.astype(np.float32)),
               "mean": jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.01),
               "lam": jnp.asarray(1 + 0.1 * rng.standard_normal(c).astype(np.float32))}
    x = jnp.asarray(rng.standard_normal((b * g, 64, c)).astype(np.float32) * 0.5)
    fp = flat + (rparams["basis"], rparams["mean"], rparams["lam"])
    ref = fsb._xla_twin(x, blk, rparams, nh=nh, window=8, nw=g,
                        shift=4, resolution=(16, 16), double_ffn=False)
    scale = float(np.abs(np.asarray(ref)).max())

    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = fsb.fused_swin_block(x, fp, nh, 8, g, 4, (16, 16), True, False,
                                   jnp.bfloat16)
    assert got.dtype == jnp.float32
    rel = float(np.abs(np.asarray(got) - np.asarray(ref)).max()) / scale
    assert rel < 0.03, rel

    small = ln_mlp._vmem_need(64, c, 384 // 2, c) + 1
    with mock.patch.object(fsb, "_VMEM_BUDGET", 1), \
         mock.patch.object(ln_mlp, "_VMEM_BUDGET", small), \
         mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got2 = fsb.fused_swin_block(x, fp, nh, 8, g, 4, (16, 16), True, False,
                                    jnp.bfloat16)
    rel2 = float(np.abs(np.asarray(got2) - np.asarray(ref)).max()) / scale
    assert rel2 < 0.03, rel2


def test_packed_attention_underflow_guard(rng):
    """A head whose scores sit ~200 logits below a packed sibling's max
    must degrade to a 0-output head (denominator floor), never 0/0 NaN
    (`common.attention_core` group-global max note)."""
    from audio_residual_tpu.ops.pallas import common as pc

    g, n, nh, hg, hd = 1, 8, 4, 4, 8
    c = nh * hd
    q = np.zeros((g * n, 3 * c), np.float32)
    # head 0's keys huge -> its scores dominate the group max; head 2's
    # q.k products sit hundreds below after the global-max subtraction
    q[:, :] = 0.1
    q[:, c : c + hd] = 150.0   # head 0 K -> group row max ~ +120
    q[:, c + 2 * hd : c + 3 * hd] = -150.0  # head 2 K -> exp(-240) == 0.0
    qkv = jnp.asarray(q)
    bias = jnp.zeros((nh // hg, n, hg * n), jnp.float32)
    mask = jnp.zeros((g, n, n), jnp.float32)
    bdot = lambda a, b, dims: jax.lax.dot_general(  # noqa: E731
        a, b, dimension_numbers=dims, preferred_element_type=jnp.float32)
    out = pc.attention_core(qkv, bias, mask, g=g, n=n, c=c, nh=nh,
                            scale=1.0, bdot=bdot, hg=hg)
    assert bool(jnp.isfinite(out).all())


def test_fused_block_bf16_activation_storage(rng):
    """bf16 x in -> bf16 out under ``mxu_dtype=bfloat16`` (the AMP layer
    loop keeps inter-block activations bf16; forcing f32 storage would add
    a cast + double the x/out DMA — measured 1.55x on the L0 GEMM chain).
    Values match the f32-stored path within bf16 rounding, and the
    custom-vjp accepts the bf16 cotangent (λ-training differentiates
    through downstream bf16 blocks)."""
    from audio_residual_tpu.ops.pallas import swin_block as fsb

    c, nh, g, b = 96, 4, 4, 2
    blk, flat = _block_params(rng, c, nh)
    x = jnp.asarray(rng.standard_normal((b * g, 64, c)).astype(np.float32) * 0.5)
    xb = x.astype(jnp.bfloat16)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got_f32 = fsb.fused_swin_block(x, flat, nh, 8, g, 4, (16, 16), False,
                                       False, jnp.bfloat16)
        got_bf16 = fsb.fused_swin_block(xb, flat, nh, 8, g, 4, (16, 16), False,
                                        False, jnp.bfloat16)
    assert got_bf16.dtype == jnp.bfloat16
    scale = float(np.abs(np.asarray(got_f32)).max())
    rel = float(
        np.abs(np.asarray(got_bf16, dtype=np.float32) - np.asarray(got_f32)).max()
    ) / scale
    assert rel < 0.03, rel

    # gradient flows through the bf16-stored block (twin runs f32)
    def loss(x_):
        with mock.patch.object(
            pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
        ):
            out = fsb.fused_swin_block(x_, flat, nh, 8, g, 4, (16, 16), False,
                                       False, jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx = jax.grad(loss)(xb)
    assert gx.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(gx.astype(jnp.float32)).all())


def test_fused_frontend_matches_rfft(rng):
    from audio_residual_tpu.ops import frontend as fe
    from audio_residual_tpu.ops.pallas import frontend as pfe

    cfg = fe.FrontendConfig()
    wav = jnp.asarray((rng.standard_normal((2, 24000)) * 0.1).astype(np.float32))
    ref = fe.logmel(wav, cfg)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = pfe.fused_logmel(wav, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


@pytest.mark.parametrize("n_fft,hop,fmax,t", [
    (1536, 480, 14000.0, 24000), (1024, 320, 18000.0, 24000),
    # hop == n_fft (k=1) with T chosen so nf (48) is exactly blk-aligned
    # while the padded signal (24612) overruns rows_needed*hop (24576):
    # without the rows_needed round-up guard (advisor r2 #3) the pad width
    # goes negative and jnp.pad raises
    (512, 512, 14000.0, 24100),
])
def test_fused_frontend_other_configs(rng, n_fft, hop, fmax, t):
    """Non-default FFT/hop/fmax configs (PANN-14-win-1536 etc.): exercises
    the k=4 row-span, different active-bin trims, and the hop==n_fft k=1
    round-up edge."""
    from audio_residual_tpu.ops import frontend as fe
    from audio_residual_tpu.ops.pallas import frontend as pfe

    cfg = fe.FrontendConfig(n_fft=n_fft, win_length=n_fft, hop_length=hop, fmax=fmax)
    wav = jnp.asarray((rng.standard_normal((2, t)) * 0.1).astype(np.float32))
    ref = fe.logmel(wav, cfg)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = pfe.fused_logmel(wav, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_fused_frontend_bf16x3_mode(rng):
    """The AMP-mode DFT (3-pass bf16 split-pair) stays within a few
    millidB of the f32 log-mel (the model's bf16 path couples to it)."""
    from audio_residual_tpu.ops import frontend as fe
    from audio_residual_tpu.ops.pallas import frontend as pfe

    cfg = fe.FrontendConfig()
    wav = jnp.asarray((rng.standard_normal((2, 24000)) * 0.1).astype(np.float32))
    ref = fe.logmel(wav, cfg)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = pfe.fused_logmel(wav, cfg, dft_mode="bf16x3")
    assert float(jnp.abs(got - ref).max()) < 0.02  # dB


def test_fused_frontend_bf16_rows_mode(rng):
    """AMP-mode DFT with bf16 ROW STORAGE (halved DMA + pre-pad traffic):
    stays within the documented post-log tolerance of the f32 kernel, and
    the rounding point is unchanged — rows cast once, same as the in-dot
    cast of the old bf16 path."""
    from audio_residual_tpu.ops import frontend as fe
    from audio_residual_tpu.ops.pallas import frontend as pfe

    cfg = fe.FrontendConfig()
    wav = jnp.asarray((rng.standard_normal((2, 24000)) * 0.1).astype(np.float32))
    ref = fe.logmel(wav, cfg)
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = pfe.fused_logmel(wav, cfg, dft_mode="bf16")
    # single-pass bf16 DFT: ~0.05 dB typical, generous bound for CPU interp
    assert float(jnp.abs(got - ref).max()) < 0.5  # dB


def test_fused_frontend_frame_block_override(rng):
    """frame_block only re-tiles the grid — per-frame math is independent of
    the block up to the backend matmul's M-dependent accumulation order
    (last-ulp), so any override reproduces the default result tightly."""
    from audio_residual_tpu.ops import frontend as fe
    from audio_residual_tpu.ops.pallas import frontend as pfe

    cfg = fe.FrontendConfig()
    wav = jnp.asarray((rng.standard_normal((1, 24000)) * 0.1).astype(np.float32))
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        base = pfe.fused_logmel(wav, cfg)
        blk16 = pfe.fused_logmel(wav, cfg, frame_block=16)
    np.testing.assert_allclose(np.asarray(base), np.asarray(blk16), atol=1e-4, rtol=0)


def test_mel_active_bins_trim_is_exact(rng):
    """Bins outside [fmin, fmax] have exactly-zero mel weight, so the
    trimmed DFT drops only zero terms (the fused kernel's ~1.7x FLOP cut
    rests on this). Equal up to the contraction's accumulation-order
    rounding."""
    from audio_residual_tpu.ops import frontend as fe

    cfg = fe.FrontendConfig()
    lo, hi = fe.mel_active_bins(cfg)
    W = fe.mel_filterbank(cfg)
    assert 0 <= lo < hi <= cfg.n_fft // 2 + 1
    assert hi - lo < 320  # fmax 14 kHz @ 48 kHz keeps ~300 of 513 bins
    assert not W[:lo].any() and not W[hi:].any()
    power = np.abs(rng.standard_normal((7, W.shape[0]))).astype(np.float32)
    full = power @ W
    trimmed = power[:, lo:hi] @ W[lo:hi]
    np.testing.assert_allclose(trimmed, full, rtol=2e-6, atol=0)


@pytest.mark.parametrize("c,nh,nw,res", [(2048, 32, 1, (8, 8)), (1024, 16, 4, (16, 16))])
def test_wide_plan_bf16_budget_widens_chunks(rng, c, nh, nw, res):
    """Under bf16 AMP the wide plan budgets streamed tensors at 2 bytes, so
    the same VMEM admits wider weight chunks / window groups than the f32
    plan (PERF.md 'next candidates', VERDICT r3 item 2a) — and the widened
    plan stays numerically exact (same math, different blocking)."""
    from audio_residual_tpu.ops.pallas import window_attention as fwa

    plan_f32 = fwa.wide_plan(nw, 64, c, nh, 4)
    plan_bf16 = fwa.wide_plan(nw, 64, c, nh, 2)
    assert plan_f32 is not None and plan_bf16 is not None
    # strictly more streaming width or window parallelism
    assert (plan_bf16[0], plan_bf16[1] + plan_bf16[2]) > (plan_f32[0], plan_f32[1] + plan_f32[2]) \
        or plan_bf16[1] + plan_bf16[2] > plan_f32[1] + plan_f32[2]

    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.02)
    bqkv = jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.02)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.02)
    bproj = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.02)
    tbl = jnp.asarray(rng.standard_normal(((15) ** 2, nh)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((2 * nw, 64, c)).astype(np.float32) * 0.5)

    ref = fwa._xla_reference(
        x, wqkv, bqkv, wproj, bproj, tbl, nh=nh, window=8,
        num_windows_per_image=nw, shift=0, resolution=res,
    )
    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        got = fwa.fused_window_attention(
            x.astype(jnp.bfloat16), wqkv, bqkv, wproj, bproj, tbl,
            nh, 8, nw, 0, res, jnp.bfloat16,
        )
    scale = float(np.abs(np.asarray(ref)).max())
    rel = float(np.abs(np.asarray(got, dtype=np.float32) - np.asarray(ref)).max()) / scale
    assert rel < 0.03, rel


@pytest.mark.parametrize(
    "use_attn,use_block,use_fe",
    [(True, False, False), (False, True, False), (False, False, True),
     (True, True, True)],
)
def test_golden_path_toggle_matrix(rng, use_attn, use_block, use_fe):
    """CLAUDE.md convention, strongest form (VERDICT r4 item 7): with
    ``compute_dtype=None`` the end-to-end embedding must be independent of
    every ``use_pallas_*`` toggle. The standalone attention kernel is
    bit-identical; the fused block/frontend kernels reorder f32
    accumulations (different blocking), so those arms are bounded at
    f32-rounding scale (~1e-7 measured) — three orders of magnitude below
    any bf16 AMP-mode leak (~1e-3), which is what this test exists to
    catch."""
    import dataclasses
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tiny

    from audio_residual_tpu.models import clap as clap_mod

    params = tiny.tiny_clap_params()
    cfg = tiny.TINY_CLAP
    wav = jnp.asarray(
        rng.standard_normal((2, cfg.audio.clip_samples)).astype(np.float32) * 0.1)
    batch = {"waveform": wav, "longer": jnp.zeros((2,), bool)}

    def run(attn, block, fe):
        acfg = dataclasses.replace(
            cfg.audio, use_pallas_attention=attn, use_pallas_block=block,
            use_pallas_frontend=fe)
        c = dataclasses.replace(cfg, audio=acfg)
        return np.asarray(
            clap_mod.encode_audio(params, batch, c, compute_dtype=None)["normalized"])

    off = run(False, False, False)
    with mock.patch.object(jax, "default_backend", lambda: "tpu"), \
         mock.patch.object(pl, "pallas_call",
                           functools.partial(pl.pallas_call, interpret=True)):
        on = run(use_attn, use_block, use_fe)
    if (use_attn, use_block, use_fe) == (True, False, False):
        assert (on == off).all(), "standalone W-MSA kernel must be bit-identical"
    diff = np.abs(on - off).max()
    assert diff < 1e-6, f"golden path drifted with toggles: {diff}"


def test_wide_path_honors_caller_output_dtype(rng):
    """Output-dtype contract under AMP (ADVICE r4): the wide
    (weight-streaming) plan must return the CALLER's activation dtype, same
    as the standard kernel — an f32 x with mxu_dtype set comes back f32."""
    from audio_residual_tpu.ops.pallas import window_attention as fwa

    c, nh, nw, res = 1024, 16, 4, (16, 16)
    assert fwa.pick_group(nw, 64, c, nh) is None  # routes through wide plan
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32) * 0.02)
    bqkv = jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.02)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.02)
    bproj = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.02)
    tbl = jnp.asarray(rng.standard_normal((15 ** 2, nh)).astype(np.float32) * 0.02)
    x32 = jnp.asarray(rng.standard_normal((nw, 64, c)).astype(np.float32) * 0.5)

    with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
        out32 = fwa.fused_window_attention(
            x32, wqkv, bqkv, wproj, bproj, tbl, nh, 8, nw, 0, res, jnp.bfloat16)
        out16 = fwa.fused_window_attention(
            x32.astype(jnp.bfloat16), wqkv, bqkv, wproj, bproj, tbl,
            nh, 8, nw, 0, res, jnp.bfloat16)
    assert out32.dtype == jnp.float32  # caller dtype preserved
    assert out16.dtype == jnp.bfloat16
    a = np.asarray(out32, np.float32)
    b = np.asarray(out16, np.float32)
    assert np.abs(a - b).max() <= 0.02 * max(np.abs(a).max(), 1e-6)


def test_fused_block_bf16_backward_amp_grads(rng):
    """Under AMP the custom-vjp backward follows mxu_dtype: GEMM operands
    bf16 (the reference's autocast backward analog), cotangents/weight
    grads f32, dx in the bf16 storage dtype — and the gradients stay
    within bf16-mantissa error of the golden f32 backward."""
    from audio_residual_tpu.ops.pallas import swin_block as fsb

    c, nh, g = 96, 4, 4
    blk, flat = _block_params(rng, c, nh)
    x = jnp.asarray(rng.standard_normal((g, 64, c)).astype(np.float32) * 0.5)

    def loss(x_, fp, dt):
        with mock.patch.object(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)):
            out = fsb.fused_swin_block(
                x_ if dt is None else x_.astype(dt),
                fp, nh, 8, g, 4, (16, 16), False, False, dt)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx32, gp32 = jax.grad(loss, argnums=(0, 1))(x, flat, None)
    gx16, gp16 = jax.grad(loss, argnums=(0, 1))(x, flat, jnp.bfloat16)
    assert all(np.asarray(l).dtype == np.float32 for l in jax.tree.leaves(gp16))
    for a, b in zip(jax.tree.leaves(gp32), jax.tree.leaves(gp16)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.abs(a - b).max() <= 0.05 * max(np.abs(a).max(), 1e-6)
    a, b = np.asarray(gx32, np.float32), np.asarray(gx16, np.float32)
    assert np.abs(a - b).max() <= 0.05 * np.abs(a).max()
