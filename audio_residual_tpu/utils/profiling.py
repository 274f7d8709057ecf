"""Profiling / tracing utilities.

The reference's observability is wall-clock AverageMeters and an optional
``torch.jit.trace`` (`SURVEY.md §5 tracing`). TPU-native additions: XLA
profiler traces viewable in TensorBoard/Perfetto, named trace annotations,
and a scan-amortized throughput timer that survives async device relays
(per-dispatch latency through a remote tunnel otherwise dominates and
``block_until_ready`` does not await queued work).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["trace", "annotate", "measure_seconds", "measure_throughput",
           "htsat_flops_per_clip", "text_tower_flops_per_sample",
           "TimingUnreliableError"]


class TimingUnreliableError(RuntimeError):
    """The two-point timing delta never cleared the rep-to-rep jitter band.

    An environment-degraded condition (noisy tunnel / workload too small),
    not a code bug: callers that promise a distinguishable environment-down
    artifact (bench.py) catch this specifically instead of letting a bare
    traceback eat the run (ADVICE r4)."""


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace: ``with trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def measure_seconds(fn, args, *, iters: int = 10, reps: int = 3,
                    const_args=()) -> float:
    """Seconds per call of ``fn(*args, *const_args)`` — the ONE timing core
    every perf tool here uses (`bench.py`, `examples/perf_breakdown.py`,
    :func:`measure_throughput`).

    Method: ``iters`` executions chained through a data dependency inside
    ONE jitted ``lax.scan`` (queue tricks cannot skew it), timed at TWO
    scan lengths (``iters`` and ``2*iters``) with the per-iter time taken
    from the DIFFERENCE — the per-dispatch relay latency (~30 ms through
    the axon tunnel, same order as a ~1 ms kernel amortized over 10 iters)
    cancels exactly instead of inflating short programs.

    Pass model params / optimizer state through ``const_args``, NOT a
    closure: arrays a traced function closes over are embedded in the
    lowered module as dense literals, and a full CLAP train step captured
    this way lowers to a **1.24 GB** StableHLO module (vs 12 MB with the
    same pytrees as arguments) — the axon relay rejects it with HTTP 413,
    and even under the limit every compile ships the weights uncompressed.
    ``const_args`` ride outside the scan's carry perturbation (they are
    loop-invariant by construction), while every ``args`` leaf gets the
    carry-dependency nudge that defeats queue tricks."""

    def make(length):
        @jax.jit
        def multi(*all_a):
            a, ca = all_a[: len(args)], all_a[len(args):]

            def body(carry, _):
                out = fn(*jax.tree.map(
                    lambda t: (t + carry * 1e-12).astype(t.dtype), a), *ca)
                leaf = jax.tree.leaves(out)[0]
                return jnp.mean(leaf.astype(jnp.float32)), None

            s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
            return s

        return multi

    def timed(m):
        float(np.asarray(m(*args, *const_args)))  # compile + sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(m(*args, *const_args)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), float(max(ts) - min(ts))

    # Noise guard (ADVICE r3): a non-positive delta, or one inside the
    # rep-to-rep jitter band, must never be clamped into an astronomical
    # throughput number — those feed README/PERF claims. Retry with 4x the
    # scan length (the signal grows linearly, the relay jitter doesn't);
    # give up loudly if the measurement still can't clear the noise.
    n = iters
    for _ in range(3):
        t2, spread2 = timed(make(2 * n))
        t1, spread1 = timed(make(n))
        delta = t2 - t1
        if delta > max(spread1, spread2, 1e-7):
            return delta / n
        last_n = n
        n *= 4
    raise TimingUnreliableError(
        f"measure_seconds: timing delta {delta * 1e6:.1f}us did not clear the "
        f"rep jitter ({spread1 * 1e6:.1f}/{spread2 * 1e6:.1f}us) even at "
        f"scan lengths {last_n}/{2 * last_n} — workload too small or "
        f"environment too noisy for a trustworthy number"
    )


def measure_throughput(forward, example, *, iters: int = 10, batch_axis: int = 0) -> dict:
    """Steady-state timing of ``forward(example) -> array`` via
    :func:`measure_seconds`. Returns {seconds_per_iter, items_per_sec}."""
    dt = measure_seconds(forward, (example,), iters=iters)
    return {
        "seconds_per_iter": dt,
        "items_per_sec": example.shape[batch_axis] / dt,
    }


def htsat_flops_per_clip(
    cfg, clip_samples: int | None = None, *, pallas_frontend: bool = True
) -> float:
    """Analytical forward FLOPs for one clip through the zero-shot path
    (frontend + HTSAT + audio projection), counting multiply-adds as 2 FLOPs.

    Needed because XLA's ``compiled.cost_analysis()`` excludes custom-call
    (Pallas) FLOPs, which silently deflates MFU once the fused kernels carry
    most of the math. Counts every matmul/conv including the bicubic
    time-stretch (a dense matmul since the AMP boundary moved before it);
    elementwise ops (norms, gelu, softmax) are omitted — <2% of the total —
    so treat this as a slight lower bound.

    ``pallas_frontend`` (default, the bench's path) counts only the
    mel-active FFT bins the fused kernel actually computes
    (`ops/frontend.py::mel_active_bins`); pass False for the full-bin XLA
    reference frontend so the MFU numerator always matches the executed math.
    """
    t = clip_samples if clip_samples is not None else cfg.clip_samples
    n_fft, hop = cfg.n_fft, cfg.hop_size
    frames = (t + 2 * (n_fft // 2) - n_fft) // hop + 1
    if pallas_frontend:
        from audio_residual_tpu.ops import frontend as _fe

        lo, hi = _fe.mel_active_bins(cfg.frontend_config)
        bins = hi - lo
    else:
        bins = n_fft // 2 + 1
    f = 0.0
    # STFT as two dense [n_fft -> bins] matmuls (ops/frontend.py)
    f += frames * 2 * 2 * n_fft * bins
    # mel projection
    f += frames * 2 * bins * cfg.mel_bins
    # bicubic time-stretch (reshape_wav2img): a [target_T, frames] matmul
    # over the mel width (the F axis is size-unchanged and skipped)
    if frames != cfg.spec_size * cfg.freq_ratio:
        f += 2 * (cfg.spec_size * cfg.freq_ratio) * frames * cfg.mel_bins
    # patch embed conv: (spec/4)^2 patches x (4x4xC_in -> embed)
    grid = cfg.spec_size // cfg.patch_stride[0]
    in_ch = 4 if getattr(cfg, "enable_fusion", False) and "2d" in str(
        getattr(cfg, "fusion_type", "")
    ) else 1
    f += 2 * grid * grid * cfg.embed_dim * cfg.patch_size * cfg.patch_size * in_ch
    # Swin layers
    window_tokens = cfg.window_size * cfg.window_size
    for i, depth in enumerate(cfg.depths):
        c = cfg.embed_dim * 2**i
        n = (grid // 2**i) ** 2
        per_block = (
            2 * n * c * 3 * c  # qkv
            + 2 * 2 * n * window_tokens * c  # scores + attn@v
            + 2 * n * c * c  # proj
            + 2 * 2 * n * c * int(cfg.mlp_ratio * c)  # fc1 + fc2
        )
        f += depth * per_block
        if i < len(cfg.depths) - 1:  # patch merging
            f += 2 * (n // 4) * (4 * c) * (2 * c)
    # tscam head: [C_out=classes] conv over the final (freq-grouped) grid
    c_final = cfg.embed_dim * 2 ** (len(cfg.depths) - 1)
    n_final = (grid // 2 ** (len(cfg.depths) - 1)) ** 2
    f += 2 * n_final * c_final * cfg.num_classes * 3  # kernel (SF, 3) approx
    # audio projection MLP 768 -> 512 -> 512
    f += 2 * (c_final * 512 + 512 * 512)
    return float(f)


def text_tower_flops_per_sample(cfg, seq_len: int = 77) -> float:
    """Analytical forward FLOPs for one 77-token text through a BERT-style
    tower (roberta/bert; multiply-add = 2 FLOPs). Companion of
    :func:`htsat_flops_per_clip` for the contrastive train-step MFU: at
    roberta-base width the text forward (~13.2 GF) is the same order as the
    audio forward, which is why the train step is ~5x the inference FLOPs
    per clip before the backward's 2x."""
    d = cfg.hidden_size
    i = cfg.intermediate_size
    t = seq_len
    per_layer = (
        2 * t * d * d * 4          # q/k/v/out projections
        + 2 * 2 * t * t * d        # scores + probs@V
        + 2 * 2 * t * d * i        # fc1 + fc2
    )
    f = cfg.num_layers * per_layer
    f += 2 * d * d  # pooler (CLS row only)
    return float(f)
