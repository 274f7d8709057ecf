"""Fused W-MSA Pallas kernel.

Computes a Swin block's attention — qkv projection, per-head scores,
relative-position bias, shifted-window mask, softmax, value aggregation,
output projection — in ONE kernel, keeping every intermediate in VMEM.

Motivation (measured on v5e): the XLA path materialises qkv / q / k / v /
scores / probs tensors in HBM between the batched matmuls; for HTSAT-tiny
layer 0 the probs alone are B*64 windows x 4 heads x 64 x 64 floats per
block. The fused kernel removes that traffic.

Grid = (images, window_groups): each program handles ``G`` windows of one
image, so the SW-MSA mask block for those windows is selected by the second
grid index (window w of every image carries mask w). ``G`` is chosen per
layer to fit the ~16 MB VMEM budget. Mosaic supports a single batch dim in
``dot_general``, so the (windows, heads) pair is flattened into one.

Semantics identical to ``window_attention`` (`htsat.py:326-357` reference)
minus dropout (rates are 0 in all shipped configs) and the attention-probs
tap (the XLA path serves taps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_residual_tpu.ops import windows as win_ops
from audio_residual_tpu.ops.pallas import common

__all__ = ["fused_window_attention", "supports", "pick_group"]

_VMEM_BUDGET = 13 * 1024 * 1024


def _vmem_need(g: int, n: int, c: int, nh: int, hg: int = 1) -> int:
    f32 = 4
    hd = c // nh
    return (
        g * n * c * f32 * 2  # x + out
        + g * n * 3 * c * f32  # qkv
        + 2 * g * nh * n * n * f32  # scores + probs
        + (2 * g * hg * n * hg * hd * f32 if hg > 1 else 0)  # packed K/V wide
        # attention_core's hg>1 extras: mask_w [g, n, hg*n] + blockmask
        + ((g * n * hg * n + hg * n * hg * hd) * f32 if hg > 1 else 0)
        + (3 * c * c + c * c) * f32  # weights
        + (nh + g) * n * n * f32  # bias + mask blocks
    )


def pick_group(
    num_windows_per_image: int, n: int, c: int, nh: int, hg: int = 1
) -> int | None:
    """Largest divisor of nW/image whose working set fits VMEM."""
    g = num_windows_per_image
    while g >= 1:
        if num_windows_per_image % g == 0 and _vmem_need(g, n, c, nh, hg) < _VMEM_BUDGET:
            return g
        g //= 2
    return None


def wide_plan(
    num_windows_per_image: int, n: int, c: int, nh: int, esize: int = 4
) -> tuple[int, int, int] | None:
    """Plan for the weight-streaming variant (wide c, where wqkv/wproj no
    longer fit VMEM whole): ``(g, qc, pc)`` — window group, qkv-column chunk,
    proj-column chunk. Chunks are 128-lane multiples, divide ``c`` (so no
    chunk straddles the q/k/v segment boundaries), and ``qc`` is a multiple
    of the head dim (head slices stay inside one chunk).

    ``esize`` is the byte width of the STREAMED tensors (x/out blocks and
    the pre-cast weight chunks — see `_wide_attention`); the f32 scratch and
    scores are budgeted at 4 regardless. Under bf16 AMP (esize=2) the same
    budget admits 2x-wider chunks / window groups: at c=2048 (large layer 3)
    the f32 budget caps chunks at 256 columns while bf16 streams 512."""
    hd = c // nh
    g = num_windows_per_image
    while g >= 1:
        if num_windows_per_image % g == 0:
            for qc in (512, 256, 128):
                if c % qc or qc % hd or qc % 128:
                    continue
                for pc in (512, 256, 128):
                    if c % pc or pc % 128:
                        continue
                    if _wide_vmem_need(g, n, c, nh, qc, pc, esize) < _VMEM_BUDGET:
                        return g, qc, pc
        g //= 2
    return None


def _wide_vmem_need(
    g: int, n: int, c: int, nh: int, qc: int, pc: int, esize: int = 4
) -> int:
    f32 = 4
    return (
        g * n * c * esize  # y block (stored in the caller's AMP dtype)
        + 3 * g * n * c * f32  # qkv scratch ([KA, g*n, qc] == 3*g*n*c total)
        + g * n * c * f32  # attention-output scratch
        + g * n * pc * esize  # out block
        + 2 * (c * qc + c * pc) * esize  # weight chunks, double-buffered
        + 2 * g * n * n * f32  # one head's scores + probs at a time
        + (nh + g) * n * n * f32  # bias + mask blocks
    )


def supports(num_windows_per_image: int, n: int, c: int, nh: int) -> bool:
    return (
        pick_group(num_windows_per_image, n, c, nh) is not None
        or wide_plan(num_windows_per_image, n, c, nh) is not None
    )


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, mask_ref, o_ref,
            *, g, n, c, nh, scale, mxu_dtype=None, hg=1):
    """Mosaic-friendly decomposition: one big qkv GEMM, then a static
    per-head-group loop. Only leading-dim splits and last-dim slices — no
    >4D vector reshapes (Mosaic can't lower those).

    ``hg`` heads per packed group — see `common.attention_core`.
    """

    def dot(a, b):  # MXU matmul, optional bf16 inputs, f32 accumulate
        if mxu_dtype is not None:
            a, b = a.astype(mxu_dtype), b.astype(mxu_dtype)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def bdot(a, b, dims):
        if mxu_dtype is not None:
            a, b = a.astype(mxu_dtype), b.astype(mxu_dtype)
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    xw = x_ref[:].reshape(g * n, c)
    qkv = dot(xw, wqkv_ref[:]) + bqkv_ref[:]
    o = common.attention_core(
        qkv, bias_ref, mask_ref[:], g=g, n=n, c=c, nh=nh, scale=scale,
        bdot=bdot, hg=hg, mxu_dtype=mxu_dtype,
    )
    out = dot(o, wproj_ref[:]) + bproj_ref[:]
    o_ref[:] = out.reshape(g, n, c).astype(o_ref.dtype)


def _xla_reference(x, wqkv, bqkv, wproj, bproj, rel_bias_table, *, nh, window,
                   num_windows_per_image, shift, resolution, mxu_dtype=None):
    """Plain-XLA twin of the kernel — used for the custom-vjp backward.

    ``mxu_dtype`` casts GEMM operands only (the kernel's AMP contract);
    softmax/bias/adds stay f32 — see `swin_block._xla_twin`."""
    bnw, n, c = x.shape
    hd = c // nh
    scale = hd**-0.5
    md = (lambda t: t.astype(mxu_dtype)) if mxu_dtype is not None else (lambda t: t)
    qkv = (jnp.dot(md(x.reshape(bnw * n, c)), md(wqkv),
                   preferred_element_type=jnp.float32) + bqkv).reshape(bnw, n, 3, nh, hd)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3) * scale
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", md(q), md(k), preferred_element_type=jnp.float32)
    s = s + win_ops.gather_relative_bias(rel_bias_table, window, window)[None]
    if shift > 0:
        mask = jnp.asarray(win_ops.shift_window_mask(*resolution, window, shift))
        nw = num_windows_per_image
        s = s.reshape(bnw // nw, nw, nh, n, n) + mask[None, :, None]
        s = s.reshape(bnw, nh, n, n)
    probs = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", md(probs), md(v),
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(bnw * n, c)
    return (jnp.dot(md(o), md(wproj), preferred_element_type=jnp.float32)
            + bproj).reshape(bnw, n, c)


def _wide_kernel(y_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                 mask_ref, o_ref, qkv_scr, a_scr,
                 *, g, n, c, nh, scale, ka, mxu_dtype=None):
    """Weight-streaming W-MSA: the grid's last axis runs three phases per
    window group — (A) ``ka`` steps accumulating the qkv projection one
    weight-column chunk at a time into scratch, (B) one step of per-head
    attention (activations are small even at c=2048: [g*n, 3c] scratch),
    (C) proj-column chunks writing the output block-wise. wqkv/wproj never
    reside in VMEM whole — the reason wide layers (base/large layer 2-3,
    c >= 1024: wqkv alone is >= 12.6 MB) can't use the monolithic kernel."""
    k = pl.program_id(2)
    hd = c // nh
    qc = qkv_scr.shape[-1]

    def dot(a, b):
        if mxu_dtype is not None:
            a, b = a.astype(mxu_dtype), b.astype(mxu_dtype)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def bdot(a, b, dims):
        if mxu_dtype is not None:
            a, b = a.astype(mxu_dtype), b.astype(mxu_dtype)
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    @pl.when(k < ka)
    def _qkv_phase():
        x = y_ref[:].reshape(g * n, c)
        qkv_scr[k] = dot(x, wqkv_ref[:]) + bqkv_ref[0]

    @pl.when(k == ka)
    def _attn_phase():
        mask = mask_ref[:]
        for h in range(nh):
            def seg(s, h=h):  # s: 0=q 1=k 2=v -> [g, n, hd] slice of scratch
                ci, off = divmod(s * c + h * hd, qc)
                return qkv_scr[ci][:, off : off + hd].reshape(g, n, hd)

            qh = seg(0) * scale
            s_ = bdot(qh, seg(1), (((2,), (2,)), ((0,), (0,))))
            s_ = s_ + bias_ref[h] + mask
            s_ = s_ - jnp.max(s_, axis=-1, keepdims=True)
            e = jnp.exp(s_)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            oh = bdot(probs, seg(2), (((2,), (1,)), ((0,), (0,))))
            a_scr[:, h * hd : (h + 1) * hd] = oh.reshape(g * n, hd)

    @pl.when(k > ka)
    def _proj_phase():
        pc = o_ref.shape[-1]
        o_ref[:] = (dot(a_scr[:], wproj_ref[:]) + bproj_ref[0]).reshape(
            g, n, pc
        ).astype(o_ref.dtype)


def _wide_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                    *, nw, n, c, nh, scale, plan, mxu_dtype):
    g, qc, pc = plan
    bnw = x.shape[0]
    b = bnw // nw
    groups = nw // g
    ka = 3 * c // qc
    kc = c // pc
    n_k = ka + 1 + kc
    # bf16 AMP: keep the x block AND the streamed weight chunks in bf16 —
    # halves both the per-phase y re-reads and the weight-stream traffic
    # (this kernel is weight-stream-bound at c >= 1024). f32 accumulate and
    # f32 scores/softmax unchanged; storage rounding == the XLA twin's
    # pre-cast, so parity tolerances are unaffected.
    store = x.dtype if mxu_dtype is not None else jnp.float32
    if mxu_dtype is not None:
        wqkv, wproj = wqkv.astype(mxu_dtype), wproj.astype(mxu_dtype)
    kernel = functools.partial(_wide_kernel, g=g, n=n, c=c, nh=nh,
                               scale=scale, ka=ka, mxu_dtype=mxu_dtype)
    qidx = lambda i, j, k: (0, jnp.minimum(k, ka - 1))  # noqa: E731
    pidx = lambda i, j, k: (0, jnp.clip(k - ka - 1, 0, kc - 1))  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(b, groups, n_k),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i, j, k: (i * (nw // g) + j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, qc), qidx, memory_space=pltpu.VMEM),
            # biases as [1, width] rows: 1-D buffers need constant index maps
            pl.BlockSpec((1, qc), qidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, pc), pidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pc), pidx, memory_space=pltpu.VMEM),
            pl.BlockSpec((nh, n, n), lambda i, j, k: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, n), lambda i, j, k: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, n, pc),
            lambda i, j, k: (i * (nw // g) + j, 0, jnp.clip(k - ka - 1, 0, kc - 1)),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bnw, n, c), store),
        scratch_shapes=[
            pltpu.VMEM((ka, g * n, qc), jnp.float32),
            pltpu.VMEM((g * n, c), jnp.float32),
        ],
    )(x.astype(store), wqkv, bqkv.reshape(1, 3 * c), wproj,
      bproj.reshape(1, c), bias, mask)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11)
)
def fused_window_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    rel_bias_table: jnp.ndarray,
    nh: int,
    window: int,
    num_windows_per_image: int,
    shift: int,
    resolution: tuple[int, int],
    mxu_dtype=None,
) -> jnp.ndarray:
    """``x [B*nW, N, C] -> attention output [B*nW, N, C]``.

    custom-vjp: forward runs the fused Pallas kernel; backward differentiates
    the plain-XLA twin (Pallas kernels have no autodiff rule) — gradients
    flow to x, the qkv/proj weights, and the relative-position-bias table,
    which the ResiDual λ-training path needs.
    """
    bnw, n, c = x.shape
    nw = num_windows_per_image
    b = bnw // nw
    hg = common.pick_head_group(nh, c // nh, n, mxu_dtype)
    g = pick_group(nw, n, c, nh, hg)
    if g is None and hg > 1:  # packed operands don't fit: plain head loop
        hg = 1
        g = pick_group(nw, n, c, nh)
    scale = (c // nh) ** -0.5

    bias = win_ops.gather_relative_bias(rel_bias_table, window, window)  # [nh, n, n]
    if shift > 0:
        mask = jnp.asarray(win_ops.shift_window_mask(*resolution, window, shift))
    else:
        mask = jnp.zeros((nw, n, n), jnp.float32)

    if g is None:
        caller_dtype = x.dtype
        if mxu_dtype is not None:
            # the esize=2 budget below assumes the streamed x/out blocks are
            # 2-byte; an f32 x under AMP would silently exceed it (the dots
            # cast operands to mxu_dtype anyway, so this round is identical)
            x = x.astype(mxu_dtype)
        plan = wide_plan(nw, n, c, nh, 2 if mxu_dtype is not None else 4)
        if plan is None:
            raise ValueError("window-attention block does not fit VMEM; use the XLA path")
        out = _wide_attention(
            x, wqkv, bqkv, wproj, bproj, bias, mask,
            nw=nw, n=n, c=c, nh=nh, scale=scale, plan=plan, mxu_dtype=mxu_dtype,
        )
        # output-dtype contract (ADVICE r4): the standard path stores in the
        # CALLER's dtype under AMP — an f32 x must come back f32 regardless
        # of which plan served the layer
        if mxu_dtype is not None and out.dtype != caller_dtype:
            out = out.astype(caller_dtype)
        return out

    bias = common.pack_bias_groups(bias, hg)
    groups = nw // g
    # bf16 AMP: preserve the caller's activation dtype through the kernel
    # (x arrives bf16 from the AMP layer loop — forcing f32 would add a
    # cast + double the x/out DMA; measured 1.55x on the L0 GEMM chain)
    store = x.dtype if mxu_dtype is not None else jnp.float32
    if mxu_dtype is not None:
        wqkv, wproj = wqkv.astype(mxu_dtype), wproj.astype(mxu_dtype)
    kernel = functools.partial(_kernel, g=g, n=n, c=c, nh=nh, scale=scale,
                               mxu_dtype=mxu_dtype, hg=hg)
    return pl.pallas_call(
        kernel,
        grid=(b, groups),
        in_specs=[
            pl.BlockSpec((g, n, c), lambda i, j: (i * (nw // g) + j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(bias.shape, lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, n), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, n, c), lambda i, j: (i * (nw // g) + j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bnw, n, c), store),
    )(x.astype(store), wqkv, bqkv, wproj, bproj, bias, mask)


def _fwa_fwd(x, wqkv, bqkv, wproj, bproj, rel_bias_table,
             nh, window, num_windows_per_image, shift, resolution, mxu_dtype=None):
    out = fused_window_attention(
        x, wqkv, bqkv, wproj, bproj, rel_bias_table,
        nh, window, num_windows_per_image, shift, resolution, mxu_dtype,
    )
    return out, (x, wqkv, bqkv, wproj, bproj, rel_bias_table)


def _fwa_bwd(nh, window, num_windows_per_image, shift, resolution, mxu_dtype,
             residuals, g):
    x, wqkv, bqkv, wproj, bproj, rel_bias_table = residuals
    # golden path (mxu_dtype=None): f32 twin exactly as before. AMP: GEMM
    # operands cast to mxu_dtype inside the twin, x stays in its bf16
    # storage — AMP-mode gradients with halved HBM traffic on the
    # transposed matmuls (see swin_block._fsb_bwd)
    xs = x if mxu_dtype is not None else x.astype(jnp.float32)
    _, vjp = jax.vjp(
        functools.partial(
            _xla_reference, nh=nh, window=window,
            num_windows_per_image=num_windows_per_image, shift=shift,
            resolution=resolution, mxu_dtype=mxu_dtype,
        ),
        xs, wqkv, bqkv, wproj, bproj, rel_bias_table,
    )
    dx, *dws = vjp(g.astype(jnp.float32))
    return (dx.astype(x.dtype), *dws)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)
