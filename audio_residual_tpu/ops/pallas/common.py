"""Numeric helpers shared by the Pallas kernels.

Single home for the pieces whose exact formulas the split-plan vs
monolithic-kernel parity depends on — a tolerance/eps change here reaches
every kernel at once.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "erf_f32", "gelu_exact", "layer_norm",
    "pick_head_group", "attention_core", "pack_bias_groups",
]


def erf_f32(x):
    """erf via Abramowitz-Stegun 7.1.26 (max error 1.5e-7 == f32 resolution).

    Mosaic lowers neither erf nor erfc; exp it does.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x):
    """Exact (erf) gelu matching torch nn.GELU() within f32 resolution."""
    return x * 0.5 * (1.0 + erf_f32(x * 0.7071067811865476))


def layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) * (x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def pick_head_group(nh: int, hd: int, n: int, mxu_dtype=None) -> int:
    """Heads per packed attention group (see :func:`attention_core`).

    hg=4 when the group's channel width fits one MXU contraction tile
    (4*hd <= 128) and windows are the standard 64 tokens — every HTSAT
    variant (hd=24, n=64) qualifies. Packing is an AMP-path optimisation
    only: with ``mxu_dtype=None`` (the golden f32 path, exact by project
    convention) auto mode always returns 1, because the packed softmax's
    group-global max + denominator floor can zero a head whose row max
    sits >~88 logits below a sibling's — a semantic deviation the golden
    path must not carry (ADVICE r3).

    ``ARPU_ATTN_HG`` overrides for A/B measurement (\"1\" = plain per-head
    loop, honored on either path); values >1 are honored only under AMP —
    the golden path must stay exact even under the experimenter knob, since
    the bench accuracy guard compares AGAINST the f32 path and would cancel
    a deviation injected into it. Malformed values or groups that don't
    divide the heads / exceed the 128 contraction lanes fall back to 1.
    NOTE: the env var is read at TRACE time — like ``frontend.DFT_MODE``,
    changing it after a jit trace of the same shapes is a silent no-op;
    restart the process (or clear the jit caches) between A/B arms.
    """
    env = os.environ.get("ARPU_ATTN_HG", "auto")
    if env not in ("", "auto"):
        try:
            hg = int(env)
        except ValueError:
            return 1
        if hg > 1 and mxu_dtype is None:
            return 1
        return hg if hg >= 1 and nh % hg == 0 and hg * hd <= 128 else 1
    if mxu_dtype is None:
        return 1
    # measured on v5e (BENCH_r03 A/B, us/clip): packing wins -25 at L0
    # (nh=4), is neutral at L1/L2 (nh=8/16), and LOSES ~3x at L3 (nh=32,
    # one window/image: 8 sequential groups of operand-building overhead
    # with no parallel window work to hide it) — so gate on head count
    if nh <= 16 and nh % 4 == 0 and 4 * hd <= 128 and n <= 128:
        return 4
    if nh <= 16 and nh % 2 == 0 and 2 * hd <= 128 and n <= 128:
        return 2
    return 1


def pack_bias_groups(bias: jnp.ndarray, hg: int) -> jnp.ndarray:
    """``[nh, n, n] -> [nh//hg, n, hg*n]``: relative-position bias in the
    lane-packed layout :func:`attention_core` consumes (done OUTSIDE the
    kernel — XLA-land, once per call)."""
    if hg == 1:
        return bias
    nh, n, _ = bias.shape
    return bias.reshape(nh // hg, hg, n, n).transpose(0, 2, 1, 3).reshape(
        nh // hg, n, hg * n
    )


def attention_core(qkv, bias_ref, mask, *, g, n, c, nh, scale, bdot, hg=1,
                   mxu_dtype=None):
    """Windowed multi-head attention inner loop -> ``[g*n, c]`` (pre-proj).

    ``qkv [g*n, 3c]``, ``bias_ref`` indexable per head (hg=1, ``[nh, n, n]``
    blocks) or per group (hg>1, ``[nh//hg, n, hg*n]`` packed layout from
    :func:`pack_bias_groups`), ``mask [g, n, n]``.

    hg=1: per-head [n, hd] x [hd, n] dots — at hd=24 (every HTSAT variant)
    these fill only 24 of the MXU's 128 contraction lanes and stream
    2*nh*n rows per window. hg>1 packs the group's heads into the LANE dim
    with block-masked wide operands: scores = Q_grp [n, hg*hd] x
    K_wide^T [hg*n, hg*hd] yields all hg heads' [n, n] score blocks in
    ceil(hg*n/128) lane tiles — half the row-streams at hg=4/hd=24 (and the
    same again for attn@V). The block-mask zeros make the math EXACT; the
    softmax max-subtraction uses the group's global row max (stability only
    — denominators stay per-head).
    """
    hd = c // nh
    outs = []
    if hg == 1:
        for h in range(nh):
            qh = qkv[:, h * hd : (h + 1) * hd].reshape(g, n, hd) * scale
            kh = qkv[:, c + h * hd : c + (h + 1) * hd].reshape(g, n, hd)
            vh = qkv[:, 2 * c + h * hd : 2 * c + (h + 1) * hd].reshape(g, n, hd)
            s = bdot(qh, kh, (((2,), (2,)), ((0,), (0,))))  # [g, n, n]
            s = s + bias_ref[h] + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            oh = bdot(probs, vh, (((2,), (1,)), ((0,), (0,))))  # [g, n, hd]
            outs.append(oh.reshape(g * n, hd))
        return jnp.concatenate(outs, axis=-1)

    w = hg * hd  # group channel width
    # packed-operand build in the MXU dtype when one is set: the dots round
    # K/V to it anyway, so pre-casting is numerically identical and the
    # concats + blockmask multiplies move half the bytes
    op_dtype = mxu_dtype or jnp.float32
    # block mask: row block h (head) keeps only its own hd channel slice
    row = jax.lax.broadcasted_iota(jnp.int32, (hg * n, w), 0) // n
    col = jax.lax.broadcasted_iota(jnp.int32, (hg * n, w), 1) // hd
    blockmask = (row == col).astype(op_dtype)
    mask_w = jnp.concatenate([mask] * hg, axis=2)  # [g, n, hg*n]
    for grp in range(nh // hg):
        h0 = grp * hg
        qg = qkv[:, h0 * hd : h0 * hd + w].reshape(g, n, w) * scale
        kg = qkv[:, c + h0 * hd : c + h0 * hd + w].reshape(g, n, w).astype(op_dtype)
        vg = qkv[:, 2 * c + h0 * hd : 2 * c + h0 * hd + w].reshape(g, n, w).astype(op_dtype)
        kw = jnp.concatenate([kg] * hg, axis=1) * blockmask  # [g, hg*n, w]
        vw = jnp.concatenate([vg] * hg, axis=1) * blockmask
        s = bdot(qg, kw, (((2,), (2,)), ((0,), (0,))))  # [g, n, hg*n]
        s = s + bias_ref[grp] + mask_w
        # group-global row max: per-head max subtraction measured -6.6%
        # end-to-end (hg slice/exp/concat VPU work), and stability only
        # needs SOME bound. A head sitting >~88 logits below a sibling's
        # max underflows to e==0 across its row — the denom floor below
        # turns that pathological case (far outside trained-model logit
        # ranges; the reference's fp16 AMP overflows even earlier) into a
        # 0-output head instead of 0/0 = NaN.
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        og = bdot(e, vw, (((2,), (1,)), ((0,), (0,))))  # [g, n, w]
        denom = []
        for h in range(hg):
            dh = jnp.sum(e[:, :, h * n : (h + 1) * n], axis=-1, keepdims=True)
            denom.append(jnp.broadcast_to(dh, (g, n, hd)))
        og = og / jnp.maximum(jnp.concatenate(denom, axis=2), 1e-30)
        outs.append(og.reshape(g * n, w))
    return jnp.concatenate(outs, axis=-1)
