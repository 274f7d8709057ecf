"""Fused residual-add + LN + MLP Pallas kernel with hidden-axis weight
streaming — the FFN half of a Swin block for layers whose MLP weights exceed
VMEM (HTSAT layer 3: 768x3072 fc1/fc2 = 19 MB, `htsat.py:716-732`).

Row-wise computation (every op is position-independent), so the grid tiles
``(row_blocks, hidden_chunks)``: fc1/fc2 weight *chunks* stream HBM->VMEM
(double-buffered by Pallas) while the row block's activations stay resident
in scratch. Chunked accumulation is exact: gelu is elementwise over hidden
units and fc2 sums over them, so ``y = h1 + Σ_k gelu(z @ W1[:,k]) @ W2[k,:]``.

Folds in the optional ResiDual epilogue (`src/residual.py:88-98`) and the
reference's double-FFN compat quirk (a second phase over the same weight
chunks — the grid's hidden axis runs ``2H`` steps and re-seeds the
accumulator at ``k == H``).

Eval-mode semantics (dropout/drop_path identity), like the other fused
kernels; training uses the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_residual_tpu.ops.pallas import common

__all__ = ["fused_residual_ffn", "ffn_plan"]

_VMEM_BUDGET = 13 * 1024 * 1024


def _vmem_need(r: int, c: int, hc: int, k_res: int) -> int:
    f32 = 4
    return (
        4 * r * c * f32  # x, a, out blocks + z scratch (all resident at once)
        + 2 * (2 * c * hc) * f32  # fc1+fc2 chunks, double-buffered
        + r * hc * f32  # hidden activation chunk
        + hc * f32  # bfc1 [1, hc] block
        + (k_res * c + c + k_res) * f32  # ResiDual basis/mean/lam
        + 4 * c * f32  # norm scale/bias + fc biases
    )


def ffn_plan(rows: int, c: int, hidden: int, k_res: int = 0) -> tuple[int, int] | None:
    """Pick (row_block, hidden_chunk): largest row block (divisor of rows,
    capped at 1024) with the largest hidden chunk (divisor of hidden,
    multiple of 128) that fits the VMEM budget."""
    row_opts = [r for r in (1024, 512, 256, 128, 64) if rows % r == 0] or (
        [rows] if rows <= 1024 else []
    )
    # Mosaic requires the streamed blocks' last dim to be a multiple of 128
    hc_opts = [d for d in range(hidden, 127, -128) if hidden % d == 0 and d % 128 == 0]
    if hidden % 128 != 0:  # tiny test configs: single full-width chunk only
        hc_opts = [hidden]
    for r in row_opts:
        for hc in hc_opts:
            if _vmem_need(r, c, hc, k_res) < _VMEM_BUDGET:
                return r, hc
    return None


# shared numeric core (ops/pallas/common.py) under the historical local names
_gelu_exact = common.gelu_exact
_ln = common.layer_norm


def _kernel(x_ref, a_ref, n2s_ref, n2b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
            bfc2_ref, rbasis_ref, rmean_ref, rlam_ref, o_ref, z_ref,
            *, n_chunks, use_residual, double_ffn, mxu_dtype=None):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        a = a_ref[:].astype(jnp.float32)
        if use_residual:
            proj = jnp.dot(a - rmean_ref[:], rbasis_ref[:].T,
                           preferred_element_type=jnp.float32)
            a = jnp.dot(proj * rlam_ref[:], rbasis_ref[:],
                        preferred_element_type=jnp.float32)
        h1 = x_ref[:].astype(jnp.float32) + a
        z_ref[:] = _ln(h1, n2s_ref[:], n2b_ref[:]).astype(z_ref.dtype)
        o_ref[:] = h1 + bfc2_ref[:]  # fc2 bias folded in once per phase

    if double_ffn:
        @pl.when(k == n_chunks)
        def _second_phase():
            # first FFN complete in o_ref; re-seed for the quirk's second pass
            y2 = x_ref[:].astype(jnp.float32) + o_ref[:]
            z_ref[:] = _ln(y2, n2s_ref[:], n2b_ref[:]).astype(z_ref.dtype)
            o_ref[:] = y2 + bfc2_ref[:]

    def dot(a, b):  # MXU matmul, optional bf16 inputs, f32 accumulate
        if mxu_dtype is not None:
            a, b = a.astype(mxu_dtype), b.astype(mxu_dtype)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    h = dot(z_ref[:], wfc1_ref[:])
    h = _gelu_exact(h + bfc1_ref[0])  # bfc1 block is [1, hc]
    o_ref[:] += dot(h, wfc2_ref[:])


def fused_residual_ffn(
    x: jnp.ndarray,
    a: jnp.ndarray,
    n2s, n2b, wfc1, bfc1, wfc2, bfc2,
    rparams: dict | None = None,
    *,
    double_ffn: bool = False,
    mxu_dtype=None,
) -> jnp.ndarray:
    """``x, a [R, C]`` (block input and post-proj attention output, flattened
    rows) -> post-block rows ``y [R, C]``."""
    rows, c = x.shape
    hidden = wfc1.shape[1]
    plan = ffn_plan(rows, c, hidden, rparams["basis"].shape[0] if rparams is not None else 0)
    if plan is None:
        raise ValueError(f"fused_residual_ffn: no VMEM plan for rows={rows} c={c} hidden={hidden}")
    r, hc = plan
    n_chunks = hidden // hc
    n_k = 2 * n_chunks if double_ffn else n_chunks

    if rparams is not None:
        rbasis, rmean, rlam = rparams["basis"], rparams["mean"], rparams["lam"]
    else:
        rbasis = jnp.zeros((1, c), jnp.float32)
        rmean = jnp.zeros((c,), jnp.float32)
        rlam = jnp.zeros((1,), jnp.float32)

    # bf16 AMP: x/a blocks keep the caller's dtype (halved input DMA) and
    # the streamed fc1/fc2 chunks ship pre-cast (halved weight-stream
    # traffic — this kernel is weight-stream-bound at HTSAT layer 3).
    # o_ref itself stays f32 (it is the cross-chunk accumulator; a bf16
    # accumulator would round every partial sum), so the caller's-dtype
    # output contract every other fused kernel honors under AMP is restored
    # by a post-call cast — XLA fuses it, and at layer 3 the out-block DMA
    # is noise next to the weight stream. Caught on real Mosaic by the
    # drive's layer3_split bf16 arm (round 5).
    store = x.dtype if mxu_dtype is not None else jnp.float32
    if mxu_dtype is not None:
        wfc1, wfc2 = wfc1.astype(mxu_dtype), wfc2.astype(mxu_dtype)

    kernel = functools.partial(
        _kernel, n_chunks=n_chunks,
        use_residual=rparams is not None, double_ffn=double_ffn,
        mxu_dtype=mxu_dtype,
    )
    const = lambda *shape: pl.BlockSpec(shape, (lambda i, k: (0,) * len(shape)), memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(rows // r, n_k),
        in_specs=[
            pl.BlockSpec((r, c), lambda i, k: (i, 0), memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((r, c), lambda i, k: (i, 0), memory_space=pltpu.VMEM),  # a
            const(c), const(c),  # norm2
            pl.BlockSpec((c, hc), lambda i, k: (0, k % n_chunks), memory_space=pltpu.VMEM),
            # bias reshaped [1, hidden]: 1-D buffers only support constant
            # index maps on TPU
            pl.BlockSpec((1, hc), lambda i, k: (0, k % n_chunks), memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda i, k: (k % n_chunks, 0), memory_space=pltpu.VMEM),
            const(c),  # fc2 bias
            const(rbasis.shape[0], c), const(c), const(rbasis.shape[0]),
        ],
        out_specs=pl.BlockSpec((r, c), lambda i, k: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, c), jnp.float32),
        # z holds the LN output pre-rounded to the MXU dtype: the fc1 dot
        # would round it anyway, and a bf16 scratch skips re-converting
        # r*c elements on every one of the n_chunks grid steps
        scratch_shapes=[pltpu.VMEM((r, c), mxu_dtype or jnp.float32)],
    )(x.astype(store), a.astype(store), n2s, n2b,
      wfc1, bfc1.reshape(1, hidden), wfc2, bfc2, rbasis, rmean, rlam)
    return out.astype(store)
