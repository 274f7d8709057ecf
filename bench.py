"""Benchmark: ESC-50 zero-shot + ResiDual inference clips/sec on one chip.

Measures the full eval pipeline of the primary metric path (SURVEY.md §3.1):
int16 round-trip -> repeatpad featurization -> HTSAT forward (ResiDual
injected, layer 0, reference PCA basis) -> audio projection -> L2 norm ->
similarity argmax vs 50 class-text embeddings — all inside one jit.

Baseline: the same eval path on torch CPU using the ACTUAL reference HTSAT
(imported from /root/reference with shimmed torchlibrosa), amortized over a
small number of clips (torch-CPU is ~3 orders of magnitude slower). The
baseline number is cached in .bench_baseline.json after first measurement.

Prints ONE JSON line:
  {"metric": ..., "value": clips/sec, "unit": "clips/sec/chip",
   "vs_baseline": x, "mfu": f}  — ``mfu`` is model-FLOPs utilisation:
XLA's cost-analysis FLOP count for the compiled program divided by
(measured seconds x the chip's peak dense FLOPs/s), so "fast" is judged
against the hardware ceiling, not only the torch-CPU baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
BATCH = int(os.environ.get("BENCH_BATCH", "128"))  # r3 sweep (bf16-stored kernels): 128/256 -> 2693/2489 clips/s
CLIP_SAMPLES = 240000  # ESC-50: 5 s @ 48 kHz
N_CLASSES = 50
# bf16 matmul inputs on the MXU (f32 accumulate; LN/softmax/ResiDual
# epilogue stay f32) — the TPU analog of the reference's AMP path. Measured
# vs f32 on-chip: +7.1% clips/s, min embedding cos 0.999993, 100% zero-shot
# argmax agreement over a 64-clip batch. BENCH_DTYPE=f32 reverts.
BENCH_DTYPE = os.environ.get("BENCH_DTYPE", "bf16")


def make_inputs(batch: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((batch, CLIP_SAMPLES)) * 0.1).astype(np.float32)


# peak dense bf16 FLOPs/s per chip by device kind (public TPU specs);
# f32 on the MXU runs via multi-pass at lower rate, so bf16 peak is the
# conventional MFU denominator
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def _peak_flops(device) -> float | None:
    kind = getattr(device, "device_kind", "")
    for k, v in _PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return None


def bench_jax_tpu() -> tuple[float, float | None, dict]:
    import jax

    # persistent compile cache: remote TPU compiles vary 20 s - 20 min under
    # tunnel-queue contention; a pre-warmed cache makes reruns take seconds
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from audio_residual_tpu.data.featurize import featurize_batch
    from audio_residual_tpu.models import clap as clap_mod
    from audio_residual_tpu.ops.quantize import quantize_roundtrip
    from audio_residual_tpu.residual.module import load_residual_params

    cfg = clap_mod.CLAPConfig()
    dft = os.environ.get("BENCH_DFT")  # e.g. "bf16": 1-pass DFT experiment
    if dft:
        import dataclasses

        cfg = dataclasses.replace(cfg, audio=dataclasses.replace(cfg.audio, dft_mode=dft))
    params = clap_mod.init_clap_params(jax.random.PRNGKey(0), cfg)
    residual = {0: load_residual_params(
        "/root/reference/residual_pca/ESC50/layer_0_evalfold_0")}
    text_embeds = jnp.asarray(
        make_inputs(1, 7)[:, : N_CLASSES * 512].reshape(N_CLASSES, 512)
    )
    text_embeds = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)

    compute_dtype = jnp.bfloat16 if BENCH_DTYPE == "bf16" else None

    def make_embed(dtype, ref_cfg=None):
        use_cfg = ref_cfg if ref_cfg is not None else cfg

        @jax.jit
        def f(params, wav):
            w = quantize_roundtrip(wav)
            batch = featurize_batch(w, use_cfg.audio.clip_samples)
            return clap_mod.encode_audio(
                params, batch, use_cfg, residual=residual, compute_dtype=dtype
            )["normalized"]

        return f

    def accuracy_guard() -> dict:
        """The headline number advertises '+ResiDual inference' accuracy:
        pin that the bench dtype mode agrees with the f32 reference path —
        per-clip zero-shot argmax identical, embedding cosine ~1 — so the
        throughput can't silently drift from the accuracy it claims
        (BASELINE.md north-star parity clause). BENCH_ASSERT=0 reports
        without failing."""
        gw = jnp.asarray(make_inputs(32, seed=123))
        e_mode = np.asarray(make_embed(compute_dtype)(params, gw))
        # reference arm: pristine f32 config — any BENCH_DFT override must
        # NOT reach it, or the comparison would cancel the DFT error out
        e_f32 = np.asarray(make_embed(None, ref_cfg=clap_mod.CLAPConfig())(params, gw))
        cos = np.sum(e_mode * e_f32, axis=-1)
        t = np.asarray(text_embeds)
        agree = float(
            np.mean((e_mode @ t.T).argmax(-1) == (e_f32 @ t.T).argmax(-1))
        )
        guard = {"min_embed_cos": round(float(cos.min()), 6), "argmax_agreement": agree}
        if os.environ.get("BENCH_ASSERT", "1") != "0":
            assert agree == 1.0, f"bench-mode argmax drifted from f32: {guard}"
            assert cos.min() > 0.999, f"bench-mode embeddings drifted: {guard}"
        return guard

    def zero_shot(params, wav):
        wav = quantize_roundtrip(wav)
        batch = featurize_batch(wav, cfg.audio.clip_samples)
        out = clap_mod.encode_audio(
            params, batch, cfg, residual=residual, compute_dtype=compute_dtype
        )
        sims = out["normalized"] @ text_embeds.T
        return sims.argmax(-1)

    # `utils/profiling.measure_seconds`: iterations chained through a data
    # dependency inside ONE jitted scan (queue tricks can't skew it), timed
    # at TWO scan lengths with the per-iter time from the DIFFERENCE — the
    # ~30 ms per-dispatch relay latency cancels exactly instead of taxing
    # the number ~5% when amortized over 10 iters.
    from audio_residual_tpu.utils.profiling import (
        htsat_flops_per_clip,
        measure_seconds,
    )

    wav = jnp.asarray(make_inputs(BATCH))
    # analytical FLOPs: XLA's cost_analysis excludes custom-call (Pallas)
    # kernels, which deflates MFU once the fused kernels carry the math
    flops = htsat_flops_per_clip(cfg.audio) * BATCH

    dt_iter = measure_seconds(lambda w: zero_shot(params, w), (wav,), iters=10)
    clips_per_sec = BATCH / dt_iter
    device = jax.devices()[0]
    peak = _peak_flops(device)
    if peak is None:
        print(f"# no peak-FLOPs entry for device kind {device.device_kind!r}; "
              "mfu omitted", file=sys.stderr)
    mfu = (flops / dt_iter / peak) if (flops and peak) else None
    guard = accuracy_guard()
    return clips_per_sec, mfu, guard


def bench_torch_cpu() -> float:
    # keyed "median3" so stale single-run caches from round 1 re-measure
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if "torch_cpu_clips_per_sec_median3" in cached:
            return cached["torch_cpu_clips_per_sec_median3"]

    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    import reference_oracle as oracle

    model = oracle.build_reference_htsat()
    model.eval()
    # reference eval path: int16 round trip + repeatpad + forward
    wav = make_inputs(4)
    wav = np.clip(wav, -1, 1)
    wav = (wav * 32767).astype(np.int16).astype(np.float32) / 32767.0
    wav = np.tile(wav, (1, 2))  # repeatpad 240000 -> 480000
    x = {"waveform": torch.from_numpy(wav)}
    with torch.no_grad():
        model(x, device="cpu")  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model(x, device="cpu")
            times.append(time.perf_counter() - t0)
    clips_per_sec = wav.shape[0] / float(np.median(times))
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"torch_cpu_clips_per_sec_median3": clips_per_sec}, f)
    return clips_per_sec


def _probe_backend(timeout_s: float) -> tuple[bool, str]:
    """Check TPU-backend health in a SUBPROCESS with a hard timeout.

    The axon tunnel has two distinct failure modes (BENCH_r03.json was the
    second): backend init raises UNAVAILABLE, or ``jax.devices()`` hangs
    indefinitely. An in-process call can't be timed out, so the probe runs
    isolated; only once it succeeds does the real bench initialize in-process
    (where the warm tunnel makes init reliable)."""
    import subprocess

    code = "import jax; print(jax.devices()[0].platform)"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
            env=os.environ.copy(),
        )
    except subprocess.TimeoutExpired:
        return False, f"backend probe hung >{timeout_s:.0f}s (tunnel stall)"
    if r.returncode != 0:
        return False, (r.stderr or r.stdout).strip().splitlines()[-1][:300] if (r.stderr or r.stdout).strip() else f"probe rc={r.returncode}"
    platform = r.stdout.strip()
    # a healthy probe must surface a TPU device: JAX silently falls back to
    # CPU when the plugin is unconfigured, and a "clips/sec/chip" number
    # measured on the 1-core host would be a normal-looking bad artifact
    if platform not in ("tpu", "axon"):
        return False, f"no TPU backend (default platform is {platform!r})"
    return True, platform


def _wait_for_backend() -> str | None:
    """Bounded retry/backoff around backend availability. Returns None when
    healthy, else the last error string after retries are exhausted."""
    retries = int(os.environ.get("BENCH_INIT_RETRIES", "5"))
    probe_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT", "120"))
    last = ""
    for attempt in range(retries):
        ok, msg = _probe_backend(probe_timeout)
        if ok:
            return None
        last = msg
        sleep_s = min(30 * (2**attempt), 300)
        more = f"; retrying in {sleep_s}s" if attempt + 1 < retries else ""
        print(
            f"# backend unavailable (attempt {attempt + 1}/{retries}): {msg}{more}",
            file=sys.stderr,
        )
        if attempt + 1 < retries:
            time.sleep(sleep_s)
    return last or "unknown backend failure"


def _emit(payload: dict) -> None:
    print(json.dumps(payload))


def main() -> None:
    # transient-tunnel resilience (VERDICT r3 weak #1): a dead tunnel must
    # produce a distinguishable environment-down JSON line, never a bare
    # traceback that silently eats the round's perf artifact.
    err = _wait_for_backend()
    if err is not None:
        _emit(
            {
                "metric": "ESC-50 zero-shot+ResiDual inference clips/sec/chip",
                "value": None,
                "unit": "clips/sec",
                "vs_baseline": None,
                "env_down": True,
                "error": f"environment-down: {err}",
            }
        )
        sys.exit(1)

    # clamp: BENCH_RUN_RETRIES<=0 must not skip the loop and leave value=None
    # for round() to trip over — the exact bare-traceback failure mode this
    # hardening exists to eliminate (ADVICE r4)
    attempts = max(1, int(os.environ.get("BENCH_RUN_RETRIES", "3")))
    value = mfu = guard = None
    for attempt in range(attempts):
        try:
            value, mfu, guard = bench_jax_tpu()
            break
        except RuntimeError as e:
            # mid-run tunnel death surfaces as UNAVAILABLE, and a tunnel too
            # noisy for the two-point timing to clear its jitter band raises
            # TimingUnreliableError — both environmental; anything else is
            # a real bug and must propagate
            from audio_residual_tpu.utils.profiling import TimingUnreliableError

            if "UNAVAILABLE" not in str(e) and not isinstance(
                e, TimingUnreliableError
            ):
                raise
            if attempt + 1 == attempts:
                # exhausting retries on tunnel deaths is still an environment
                # failure — the contract is a distinguishable JSON line,
                # never a bare traceback
                _emit(
                    {
                        "metric": "ESC-50 zero-shot+ResiDual inference clips/sec/chip",
                        "value": None,
                        "unit": "clips/sec",
                        "vs_baseline": None,
                        "env_down": True,
                        "error": f"environment-down after {attempts} attempts: {str(e)[:300]}",
                    }
                )
                sys.exit(1)
            print(f"# bench attempt {attempt + 1} hit tunnel failure: "
                  f"{str(e)[:200]}; re-probing", file=sys.stderr)
            if _wait_for_backend() is not None:
                _emit(
                    {
                        "metric": "ESC-50 zero-shot+ResiDual inference clips/sec/chip",
                        "value": None,
                        "unit": "clips/sec",
                        "vs_baseline": None,
                        "env_down": True,
                        "error": f"environment-down mid-run: {str(e)[:300]}",
                    }
                )
                sys.exit(1)
    if value is None:  # belt-and-braces: no success, no env_down emitted yet
        _emit(
            {
                "metric": "ESC-50 zero-shot+ResiDual inference clips/sec/chip",
                "value": None,
                "unit": "clips/sec",
                "vs_baseline": None,
                "env_down": True,
                "error": "environment-down: no successful bench attempt",
            }
        )
        sys.exit(1)
    try:
        baseline = bench_torch_cpu()
    except Exception:
        baseline = None
    vs = (value / baseline) if baseline else None
    _emit(
        {
            "metric": "ESC-50 zero-shot+ResiDual inference clips/sec/chip",
            "value": round(value, 2),
            "unit": "clips/sec",
            "vs_baseline": round(vs, 2) if vs else None,
            "mfu": round(mfu, 4) if mfu else None,
            "acc_guard": guard,
        }
    )


if __name__ == "__main__":
    main()
