"""Fully-fused Swin block Pallas kernel (attention + MLP, VMEM-resident).

Extends the fused W-MSA kernel (window_attention.py) to the WHOLE block in
window space: ``y = h + MLP(LN2(h))`` with ``h = x + proj(attn(LN1(x)))``.
The MLP/LN/residual adds are position-independent, so they run on windowed
tokens directly — only the cyclic shift between blocks needs image space,
which stays in XLA as cheap layout ops.

Optional extras folded in:
  * ResiDual epilogue on the post-attention residual
    (`src/residual.py:88-98`), including the reference's double-FFN compat
    quirk — so ResiDual *inference* also runs fully fused;
  * eval-mode only (drop_path/dropout are identity in every shipped eval
    path; training forwards use the XLA path).

Per-program VMEM: x/out + qkv + scores/probs + MLP hidden + weights; the
window group G is auto-chosen. HTSAT-tiny layers 0-2 fit the monolithic
kernel; layer 3's MLP weights (768x3072x2 = 19 MB) exceed VMEM, so it
dispatches to the split plan instead: the fused W-MSA kernel + the
hidden-chunked fused FFN kernel (ops/pallas/ln_mlp.py) — every layer runs
fully fused.

custom-vjp with an XLA twin for the backward (λ-training differentiates
through downstream blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_residual_tpu.ops.pallas import common

from audio_residual_tpu.ops import windows as win_ops

__all__ = ["fused_swin_block", "block_pick_group", "block_supports"]

_VMEM_BUDGET = 13 * 1024 * 1024


def _block_vmem_need(g: int, n: int, c: int, nh: int, hidden: int, hg: int = 1) -> int:
    f32 = 4
    hd = c // nh
    return (
        g * n * c * f32 * 3  # x + h + out
        + g * n * 3 * c * f32  # qkv
        + 2 * g * nh * n * n * f32  # scores + probs
        + (2 * g * hg * n * hg * hd * f32 if hg > 1 else 0)  # packed K/V wide
        # attention_core's hg>1 extras: mask_w [g, n, hg*n] + blockmask
        + ((g * n * hg * n + hg * n * hg * hd) * f32 if hg > 1 else 0)
        + g * n * hidden * f32  # mlp hidden
        + (3 * c * c + c * c + 2 * c * hidden) * f32  # weights
        + (nh + g) * n * n * f32  # bias + mask
    )


def block_pick_group(
    nw: int, n: int, c: int, nh: int, hidden: int, hg: int = 1
) -> int | None:
    g = nw
    while g >= 1:
        if nw % g == 0 and _block_vmem_need(g, n, c, nh, hidden, hg) < _VMEM_BUDGET:
            return g
        g //= 2
    return None


def _split_plan_supports(nw: int, n: int, c: int, nh: int, hidden: int,
                         k_res: int | None = None) -> bool:
    """Two-kernel fallback for weight-bound layers (HTSAT layer 3+, wide
    MLPs): fused W-MSA kernel (weight-streaming variant for c >= 1024) +
    hidden-chunked fused FFN kernel. Activations at those depths are tiny
    (one 64-token window/image), so the HBM hop between the kernels is
    negligible; the weights stream chunk-wise. ``k_res`` is the injected
    ResiDual basis row count (its [K, C] block must fit VMEM whole);
    ``None`` assumes the full-C worst case."""
    from audio_residual_tpu.ops.pallas import ln_mlp
    from audio_residual_tpu.ops.pallas import window_attention as fwa

    kr = c if k_res is None else k_res
    return fwa.supports(nw, n, c, nh) and ln_mlp.ffn_plan(n, c, hidden, kr) is not None


def block_supports(nw: int, n: int, c: int, nh: int, hidden: int,
                   k_res: int | None = None) -> bool:
    if block_pick_group(nw, n, c, nh, hidden) is not None:
        return True
    return _split_plan_supports(nw, n, c, nh, hidden, k_res)


# shared numeric core (ops/pallas/common.py) under the historical local names
_gelu_exact = common.gelu_exact
_ln = common.layer_norm


def _kernel(x_ref, n1s_ref, n1b_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            n2s_ref, n2b_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
            bias_ref, mask_ref, rbasis_ref, rmean_ref, rlam_ref, o_ref,
            *, g, n, c, nh, scale, use_residual, double_ffn, mxu_dtype=None,
            hg=1):
    def dot(a, b):  # MXU matmul, optional bf16 inputs, always f32 accumulate
        if mxu_dtype is not None:
            a, b = a.astype(mxu_dtype), b.astype(mxu_dtype)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def bdot(a, b, dims):
        if mxu_dtype is not None:
            a, b = a.astype(mxu_dtype), b.astype(mxu_dtype)
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    # bf16 AMP stores x/out in bf16 (halved DMA); all in-kernel math that
    # is not an MXU dot stays f32 — LN stats, residual adds, epilogue
    x = x_ref[:].reshape(g * n, c).astype(jnp.float32)
    y = _ln(x, n1s_ref[:], n1b_ref[:])
    qkv = dot(y, wqkv_ref[:]) + bqkv_ref[:]
    a = common.attention_core(
        qkv, bias_ref, mask_ref[:], g=g, n=n, c=c, nh=nh, scale=scale,
        bdot=bdot, hg=hg, mxu_dtype=mxu_dtype,
    )
    a = dot(a, wproj_ref[:]) + bproj_ref[:]

    if use_residual:
        # ResiDual epilogue (`src/residual.py:88-98`): center/project/scale/
        # reproject the post-attention residual before the FFN add.
        # Kept f32 even under bf16 MXU: the spectral basis projection is the
        # method's precision-sensitive core (λ perturbs per-component scale).
        proj = jnp.dot(a - rmean_ref[:], rbasis_ref[:].T, preferred_element_type=jnp.float32)
        a = jnp.dot(proj * rlam_ref[:], rbasis_ref[:], preferred_element_type=jnp.float32)

    h1 = x + a

    def ffn(t):
        z = _ln(t, n2s_ref[:], n2b_ref[:])
        z = dot(z, wfc1_ref[:]) + bfc1_ref[:]
        z = _gelu_exact(z)
        return dot(z, wfc2_ref[:]) + bfc2_ref[:]

    y = h1 + ffn(h1)
    if use_residual and double_ffn:
        # reference patched-forward quirk (`src/residual.py:95-96`)
        y2 = x + y
        y = y2 + ffn(y2)
    o_ref[:] = y.reshape(g, n, c).astype(o_ref.dtype)


def _xla_twin(x, blk, rparams, *, nh, window, nw, shift, resolution, double_ffn,
              mxu_dtype=None):
    """Plain-XLA block twin (custom-vjp backward + parity tests).

    ``mxu_dtype`` mirrors the kernel's AMP contract: MATMUL operands cast to
    it (bf16 MXU inputs, f32 accumulate via preferred_element_type), while
    LN stats, softmax, residual adds and the ResiDual epilogue stay f32 —
    so a backward differentiated through this twin produces AMP-mode
    gradients with bf16-stored GEMM operands (halved HBM traffic on the
    transposed matmuls), the TPU analog of the reference's autocast
    backward (`train.py:124-159` runs backward inside the AMP scaler)."""
    bnw, n, c = x.shape
    hd = c // nh
    scale = hd**-0.5
    md = (lambda t: t.astype(mxu_dtype)) if mxu_dtype is not None else (lambda t: t)
    y = _ln(x.astype(jnp.float32), blk["norm1"]["scale"], blk["norm1"]["bias"])
    qkv = jnp.dot(md(y.reshape(-1, c)), md(blk["attn"]["qkv"]["kernel"]),
                  preferred_element_type=jnp.float32) + blk["attn"]["qkv"]["bias"]
    qkv = qkv.reshape(bnw, n, 3, nh, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3) * scale
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", md(q), md(k), preferred_element_type=jnp.float32)
    s = s + win_ops.gather_relative_bias(blk["attn"]["rel_bias_table"], window, window)[None]
    if shift > 0:
        m = jnp.asarray(win_ops.shift_window_mask(*resolution, window, shift))
        s = (s.reshape(bnw // nw, nw, nh, n, n) + m[None, :, None]).reshape(bnw, nh, n, n)
    p = jax.nn.softmax(s, axis=-1)
    a = jnp.einsum("bhnm,bhmd->bhnd", md(p), md(v),
                   preferred_element_type=jnp.float32).transpose(0, 2, 1, 3).reshape(bnw, n, c)
    a = jnp.dot(md(a), md(blk["attn"]["proj"]["kernel"]),
                preferred_element_type=jnp.float32) + blk["attn"]["proj"]["bias"]
    if rparams is not None:
        proj = jnp.matmul(a - rparams["mean"], rparams["basis"].T,
                          precision=jax.lax.Precision.HIGHEST)
        a = jnp.matmul(proj * rparams["lam"], rparams["basis"],
                       precision=jax.lax.Precision.HIGHEST)
    h1 = x.astype(jnp.float32) + a

    def ffn(t):
        z = _ln(t, blk["norm2"]["scale"], blk["norm2"]["bias"])
        z = jax.nn.gelu(
            jnp.dot(md(z.reshape(-1, c)), md(blk["mlp"]["fc1"]["kernel"]),
                    preferred_element_type=jnp.float32) + blk["mlp"]["fc1"]["bias"],
            approximate=False)
        return (jnp.dot(md(z), md(blk["mlp"]["fc2"]["kernel"]),
                        preferred_element_type=jnp.float32)
                + blk["mlp"]["fc2"]["bias"]).reshape(bnw, n, c)

    y = h1 + ffn(h1)
    if rparams is not None and double_ffn:
        y2 = x + y
        y = y2 + ffn(y2)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def fused_swin_block(
    x: jnp.ndarray,
    flat_params: tuple,
    nh: int,
    window: int,
    num_windows_per_image: int,
    shift: int,
    resolution: tuple[int, int],
    use_residual: bool,
    double_ffn: bool,
    mxu_dtype=None,
) -> jnp.ndarray:
    """``x [B*nW, N, C]`` pre-norm windows -> post-block windows.

    ``flat_params`` = (n1s, n1b, wqkv, bqkv, wproj, bproj, n2s, n2b, wfc1,
    bfc1, wfc2, bfc2, rel_bias_table[, rbasis, rmean, rlam]).

    ``mxu_dtype=jnp.bfloat16`` runs the matmuls' inputs in bf16 on the MXU
    (f32 accumulate, LN/softmax/ResiDual epilogue stay f32) — the TPU analog
    of the reference's AMP inference path.
    """
    (n1s, n1b, wqkv, bqkv, wproj, bproj, n2s, n2b, wfc1, bfc1, wfc2, bfc2,
     table, *res) = flat_params
    bnw, n, c = x.shape
    nw = num_windows_per_image
    hidden = wfc1.shape[1]
    hg = common.pick_head_group(nh, c // nh, n, mxu_dtype)
    g = block_pick_group(nw, n, c, nh, hidden, hg)
    if g is None and hg > 1:  # packed operands don't fit: plain head loop
        hg = 1
        g = block_pick_group(nw, n, c, nh, hidden)
    if g is None:
        k_res = res[0].shape[0] if use_residual else 0
        if not _split_plan_supports(nw, n, c, nh, hidden, k_res):
            raise ValueError("block does not fit VMEM")
        return _split_block(x, flat_params, nh, window, nw, shift, resolution,
                            use_residual, double_ffn, mxu_dtype)
    b = bnw // nw
    scale = (c // nh) ** -0.5
    bias = win_ops.gather_relative_bias(table, window, window)
    if shift > 0:
        mask = jnp.asarray(win_ops.shift_window_mask(*resolution, window, shift))
    else:
        mask = jnp.zeros((nw, n, n), jnp.float32)
    if use_residual:
        rbasis, rmean, rlam = res
    else:
        rbasis = jnp.zeros((1, c), jnp.float32)
        rmean = jnp.zeros((c,), jnp.float32)
        rlam = jnp.zeros((1,), jnp.float32)

    bias = common.pack_bias_groups(bias, hg)
    # bf16 AMP: preserve the caller's activation dtype for the x/out blocks
    # (measured 1.55x on the L0 GEMM chain vs forced-f32 storage) and ship
    # the big weights pre-cast so the kernel never converts them per program
    store = x.dtype if mxu_dtype is not None else jnp.float32
    if mxu_dtype is not None:
        wqkv, wproj = wqkv.astype(mxu_dtype), wproj.astype(mxu_dtype)
        wfc1, wfc2 = wfc1.astype(mxu_dtype), wfc2.astype(mxu_dtype)
    kernel = functools.partial(
        _kernel, g=g, n=n, c=c, nh=nh, scale=scale,
        use_residual=use_residual, double_ffn=double_ffn, mxu_dtype=mxu_dtype,
        hg=hg,
    )
    k_r = rbasis.shape[0]
    full = lambda *shape: pl.BlockSpec(shape, (lambda i, j: (0,) * len(shape)), memory_space=pltpu.VMEM)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(b, nw // g),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i, j: (i * (nw // g) + j, 0, 0), memory_space=pltpu.VMEM),
            full(c), full(c),
            full(c, 3 * c), full(3 * c),
            full(c, c), full(c),
            full(c), full(c),
            full(c, hidden), full(hidden),
            full(hidden, c), full(c),
            full(*bias.shape),
            pl.BlockSpec((g, n, n), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
            full(k_r, c), full(c), full(k_r),
        ],
        out_specs=pl.BlockSpec(
            (g, n, c), lambda i, j: (i * (nw // g) + j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bnw, n, c), store),
    )(x.astype(store), n1s, n1b, wqkv, bqkv, wproj, bproj, n2s, n2b,
      wfc1, bfc1, wfc2, bfc2, bias, mask, rbasis, rmean, rlam)


def _split_block(x, flat_params, nh, window, nw, shift, resolution,
                 use_residual, double_ffn, mxu_dtype=None):
    """Weight-bound plan: LN1 in XLA (fuses into the qkv GEMM's producer),
    fused W-MSA kernel, then the hidden-chunked fused FFN kernel on
    flattened rows. Exact same semantics as the monolithic kernel."""
    from audio_residual_tpu.ops.pallas import ln_mlp
    from audio_residual_tpu.ops.pallas import window_attention as fwa

    (n1s, n1b, wqkv, bqkv, wproj, bproj, n2s, n2b, wfc1, bfc1, wfc2, bfc2,
     table, *res) = flat_params
    bnw, n, c = x.shape
    store = x.dtype if mxu_dtype is not None else jnp.float32
    x = x.astype(store)
    # LN1 stats in f32 (XLA fuses it into the qkv GEMM's producer); the
    # normalized activations travel to the W-MSA kernel in the storage dtype
    y = _ln(x.astype(jnp.float32), n1s, n1b).astype(store)
    a = fwa.fused_window_attention(
        y, wqkv, bqkv, wproj, bproj, table, nh, window, nw, shift, resolution,
        mxu_dtype=mxu_dtype,
    )
    rparams = None
    if use_residual:
        rparams = {"basis": res[0], "mean": res[1], "lam": res[2]}
    out = ln_mlp.fused_residual_ffn(
        x.reshape(bnw * n, c), a.reshape(bnw * n, c),
        n2s, n2b, wfc1, bfc1, wfc2, bfc2, rparams,
        # the double-FFN quirk only exists in the reference's *patched*
        # (residual-injected) forward — same gate as the monolithic kernel
        # and the XLA twin (`src/residual.py:92-96`)
        double_ffn=double_ffn and use_residual,
        mxu_dtype=mxu_dtype,
    )
    return out.reshape(bnw, n, c)


def _params_to_blk(flat_params):
    (n1s, n1b, wqkv, bqkv, wproj, bproj, n2s, n2b, wfc1, bfc1, wfc2, bfc2,
     table, *res) = flat_params
    blk = {
        "norm1": {"scale": n1s, "bias": n1b},
        "attn": {"qkv": {"kernel": wqkv, "bias": bqkv},
                 "proj": {"kernel": wproj, "bias": bproj},
                 "rel_bias_table": table},
        "norm2": {"scale": n2s, "bias": n2b},
        "mlp": {"fc1": {"kernel": wfc1, "bias": bfc1},
                "fc2": {"kernel": wfc2, "bias": bfc2}},
    }
    rparams = None
    if res:
        rparams = {"basis": res[0], "mean": res[1], "lam": res[2]}
    return blk, rparams


def _fsb_fwd(x, flat_params, nh, window, nw, shift, resolution, use_residual,
             double_ffn, mxu_dtype=None):
    out = fused_swin_block(x, flat_params, nh, window, nw, shift, resolution,
                           use_residual, double_ffn, mxu_dtype)
    return out, (x, flat_params)


def _fsb_bwd(nh, window, nw, shift, resolution, use_residual, double_ffn,
             mxu_dtype, residuals, g):
    x, flat_params = residuals
    blk_of = lambda fp: _params_to_blk(fp)  # noqa: E731

    def twin(x_, fp):
        blk, rparams = blk_of(fp)
        if not use_residual:
            rparams = None
        return _xla_twin(x_, blk, rparams, nh=nh, window=window, nw=nw,
                         shift=shift, resolution=resolution,
                         double_ffn=double_ffn, mxu_dtype=mxu_dtype)

    # golden path (mxu_dtype=None): twin runs f32 exactly as before. AMP:
    # the twin casts GEMM operands to mxu_dtype (storage stays bf16 for x),
    # so the backward's transposed matmuls run with bf16-stored operands —
    # AMP-mode gradients, matching the reference's autocast backward.
    # Cotangents accumulate f32; weight grads come out f32 (the casts sit
    # inside the twin, downstream of the f32 weight leaves).
    xs = x if mxu_dtype is not None else x.astype(jnp.float32)
    _, vjp = jax.vjp(twin, xs, flat_params)
    dx, dp = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dp


fused_swin_block.defvjp(_fsb_fwd, _fsb_bwd)
