"""Fused log-mel frontend Pallas kernel.

One program per frame-block: in-kernel framing (an HBM->VMEM DMA of the
block's hop-row window), windowed-DFT matmul (cos||sin basis, restricted to
the mel-active bins, MXU), power spectrum, mel projection, and log10 —
without ever writing the frames tensor OR the power spectrogram to HBM.

The DFT-as-matmul formulation matches torchlibrosa's conv1d-DFT exactly
(`htsat.py:681-687` semantics). f32 operands at Precision.HIGHEST keep the
golden tolerance vs torch.stft (2e-4 on power); the model's bf16 AMP mode
selects the single-pass bf16 DFT instead (~0.05 dB post-log, washed out by
bn0 — min embedding cos 0.999994, asserted by the bench accuracy guard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_residual_tpu.ops import frontend as fe

__all__ = ["fused_logmel"]

_LOG10_INV = float(1.0 / np.log(10.0))

# Default DFT matmul mode when ``fused_logmel(dft_mode=None)``. NOTE: jit
# caches on the (cfg, dft_mode) static key, NOT on this global — changing it
# after a None-mode call has been traced is a silent no-op for those shapes;
# pass dft_mode explicitly to sweep modes within one process:
#   "f32"    — Precision.HIGHEST, 6-pass bf16 decomposition on the MXU;
#              f32-exact, the torch.stft-golden default.
#   "bf16x3" — manual split-pair: x = hi + lo with hi = bf16(x); three
#              1-pass bf16 matmuls (hi@hi + hi@lo + lo@hi) recover ~16
#              mantissa bits. Mosaic has no Precision.HIGH lowering, so the
#              3-pass form must be spelled out.
#   "bf16"   — single 1-pass bf16 matmul (~0.4% relative on Re/Im).
DFT_MODE = "f32"


def _split_dot(a, b):
    """3-pass bf16 pair product with f32 accumulation (~2^-16 relative)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return dot(a_hi, b_hi) + (dot(a_hi, b_lo) + dot(a_lo, b_hi))


def _rows_kernel(rows_hbm, basis_ref, mel_ref, o_ref, scratch, sem,
                 *, blk, k, widths, nbins, amin, db_offset, mode):
    """In-kernel framing: frame ``i`` starts at ``i*hop``, so it is the
    concatenation of hop-sized rows ``i..i+k-1`` (last truncated) — the DFT
    ``frames @ basis`` therefore splits as ``sum_j rows[i+j] @ basis_j``,
    three matmuls over NON-overlapping rows. Each program DMAs its
    ``blk+k-1`` row window HBM->VMEM and never materialises the 2.1x-larger
    frames tensor (XLA's slice+concat framing measured 67 us/clip, ~40% of
    the old frontend)."""
    b_i = pl.program_id(0)
    i = pl.program_id(1)
    # DMA row count must be a multiple of the (8, 128) sublane tiling, so
    # the window is blk + pad8(k-1) rows rather than the minimal blk + k - 1
    dma = pltpu.make_async_copy(
        rows_hbm.at[b_i, pl.ds(i * blk, scratch.shape[0])], scratch, sem
    )
    dma.start()
    dma.wait()

    def dot(a, bm):
        if mode == "bf16":
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), bm.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if mode == "bf16x3":
            return _split_dot(a, bm)
        return jax.lax.dot_general(
            a, bm, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    used = 0
    d = None
    for j in range(k):
        w = widths[j]
        part = dot(scratch[j : j + blk, :w], basis_ref[used : used + w])
        d = part if d is None else d + part
        used += w
    re = d[:, :nbins]
    im = d[:, nbins:]
    power = re * re + im * im
    mel = jax.lax.dot_general(
        power, mel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o_ref[0] = 10.0 * _LOG10_INV * jnp.log(jnp.maximum(mel, amin)) - db_offset


@functools.partial(jax.jit, static_argnames=("cfg", "dft_mode", "frame_block"))
def fused_logmel(
    wav: jnp.ndarray,
    cfg: fe.FrontendConfig,
    dft_mode: str | None = None,
    frame_block: int | None = None,
) -> jnp.ndarray:
    """``[B, T] -> [B, frames, n_mels]`` (top_db unsupported: HTSAT uses None).

    Framing happens inside the kernel (see `_rows_kernel`): the only XLA
    work is the reflect pad and a free reshape into hop-sized rows.
    ``dft_mode`` overrides the module default (see ``DFT_MODE``); the model
    path passes "bf16" under its bf16 AMP mode (measured ~0.05 dB post-log,
    min embedding cos 0.999994 vs pure-f32; "bf16x3" remains available for
    3.2e-3 dB max error over a ~50 dB range). In "bf16" mode the row buffer
    itself is stored/DMAed as bf16 — bit-identical to casting the f32 rows
    inside the dot (round-to-nearest happens once either way), while halving
    the HBM traffic of both the XLA pre-pads and the per-program DMA.
    ``frame_block`` overrides the frames-per-program block (perf sweeps)."""
    assert cfg.top_db is None
    mode = dft_mode if dft_mode is not None else DFT_MODE
    # bf16x3 needs f32 rows in-kernel to split the lo/hi pair product
    row_dtype = jnp.bfloat16 if mode == "bf16" else jnp.float32
    align = 16 if row_dtype == jnp.bfloat16 else 8  # sublane tile height
    b, t = wav.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    pad = n_fft // 2
    # cast before the pads: reflect/zero padding commutes with the cast, so
    # the two full-signal pad copies below also run at the row dtype's width
    x = jnp.pad(wav.astype(row_dtype), [(0, 0), (pad, pad)], mode="reflect")
    nf = (x.shape[1] - n_fft) // hop + 1
    k = -(-n_fft // hop)
    widths = []
    used = 0
    for _ in range(k):
        widths.append(min(hop, n_fft - used))
        used += widths[-1]

    # frame block: 512 on the hot path, shrunk (tile-aligned for the row
    # dtype) for short inputs so a 51-frame clip doesn't pay for 512; an
    # explicit override is rounded up to the row dtype's tile height so a
    # sweep grid valid for f32 (8-row tiles) stays usable in bf16 (16-row)
    blk = min(-(-(frame_block or 512) // align) * align, -(-nf // align) * align)
    assert blk % align == 0, (blk, align)
    nf_pad = -(-nf // blk) * blk
    overhang = -(-(k - 1) // align) * align  # DMA windows need tile-aligned rows
    rows_needed = nf_pad + overhang
    # rows_needed*hop can fall short of the padded signal when hop ~ n_fft
    # and nf is already blk-aligned (no shipped config, but FrontendConfig
    # permits it); round UP so the reshape always covers the signal
    rows_needed = max(rows_needed, -(-x.shape[1] // hop))
    x = jnp.pad(x, ((0, 0), (0, rows_needed * hop - x.shape[1])))
    rows = x.reshape(b, rows_needed, hop)
    # DMA windows also need 128-lane alignment on the minor dim: pad each
    # hop-row to the next lane multiple (junk cols never enter the dots)
    hop_pad = -(-hop // 128) * 128
    if hop_pad != hop:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, hop_pad - hop)))

    lo, hi = fe.mel_active_bins(cfg)
    nbins = hi - lo
    cos, sin = fe._dft_bases(n_fft, cfg.win_length)
    basis = jnp.asarray(np.concatenate([cos[:, lo:hi], sin[:, lo:hi]], axis=1))
    mel = jnp.asarray(fe.mel_filterbank(cfg)[lo:hi])
    db_offset = float(10.0 * np.log10(max(cfg.amin, cfg.ref)))

    kernel = functools.partial(
        _rows_kernel, blk=blk, k=k, widths=tuple(widths),
        nbins=nbins, amin=cfg.amin, db_offset=db_offset, mode=mode,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nf_pad // blk),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rows stay in HBM
            pl.BlockSpec((n_fft, 2 * nbins), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbins, cfg.n_mels), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, cfg.n_mels), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nf_pad, cfg.n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk + overhang, hop_pad), row_dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(rows.astype(row_dtype), basis, mel)
    return out[:, :nf]
