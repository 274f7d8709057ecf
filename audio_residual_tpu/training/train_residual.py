"""ResiDual zero-shot training: learn the spectral-reweighting λ against fixed
class-text embeddings with a CrossEntropy objective.

Reference: `src/training.py:12-140` (epoch loop, eval variant, W&B sweep
runner) and `src/evaluation.py:19-128` (K-fold harness, .npz artifacts,
baseline eval).

TPU-native design: one jitted train step where λ is the *only* differentiated
leaf — the frozen CLAP params are a closed-over constant pytree, so XLA
constant-folds what it can and the backward is the thin chain through the
ResiDual epilogues. The whole epoch runs device-side; featurization is the
batched jit (`featurize_batch`), not the reference's per-sample host loop.

Reference quirks handled explicitly:
  * training runs the encoder in *eval-mode statistics* (the reference sets
    ``model.train()`` but the hook immediately flips ``model.eval()``,
    `hook.py:173` vs `src/training.py:17`) — we simply always encode with
    ``train=False``;
  * evaluation int16-quantises waveforms, training does not
    (`src/training.py:24` vs `:55`);
  * the patched block applies shortcut+MLP twice (`src/residual.py:92-96`) —
    ``double_ffn_compat=True`` reproduces it (default, it produced the
    published numbers); pass ``False`` for the clean semantics;
  * trained λ was never persisted by the reference — we save it.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_residual_tpu.data.featurize import featurize_batch
from audio_residual_tpu.models import clap as clap_mod
from audio_residual_tpu.ops.quantize import quantize_roundtrip
from audio_residual_tpu.residual.module import load_residual_params, save_residual_params

__all__ = [
    "make_zero_shot_step",
    "train_residual",
    "evaluate_zero_shot",
    "train_and_evaluate_residual",
    "evaluate_baseline_clap",
    "train_with_config",
]


def _split_residual(residual: dict):
    lam = {l: r["lam"] for l, r in residual.items()}
    frozen = {l: {"basis": r["basis"], "mean": r["mean"]} for l, r in residual.items()}
    return lam, frozen


def _merge_residual(lam: dict, frozen: dict):
    return {l: {**frozen[l], "lam": lam[l]} for l in frozen}


def make_zero_shot_step(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    text_embeds: jnp.ndarray,
    frozen_residual: dict,
    optimizer: optax.GradientTransformation,
    *,
    max_len: int = 480000,
    double_ffn_compat: bool = True,
    compute_dtype=None,
    start_layer: int = 0,
    tokens_input: bool = False,
    image_input: bool = False,
):
    """Build the jitted ``(lam, opt_state, wav, labels) -> (lam, opt_state,
    loss, n_correct)`` train step. λ is the only trainable pytree.

    ``start_layer > 0``: inputs are cached frozen-prefix tokens (see
    :func:`cache_prefix_tokens`) instead of waveforms — the per-epoch forward
    then starts at the first injected layer (SURVEY.md hard part #6; the
    reference re-ran the whole frozen encoder every epoch).
    ``image_input``: inputs are cached post-frontend images (see
    :func:`cache_prefix_images`) — the split that pays at the published
    best config ``inject_layers=[0]``, where token caching cannot engage."""

    def loss_fn(lam, wav, labels, rng=None):
        residual = _merge_residual(lam, frozen_residual)
        if tokens_input:
            batch = {"tokens": wav}
        elif image_input:
            batch = {"image": wav}
        else:
            # rng varies rand_trunc crops across steps on >max_len datasets
            # (`data.py:465-468` crops fresh per epoch); None = fixed crop,
            # the deterministic-eval behaviour
            batch = featurize_batch(wav, max_len, rng=rng)
        out = clap_mod.encode_audio(
            params, batch, cfg, residual=residual,
            double_ffn_compat=double_ffn_compat, compute_dtype=compute_dtype,
            start_layer=start_layer,
        )
        sims = out["normalized"] @ text_embeds.T
        logp = jax.nn.log_softmax(sims, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
        correct = jnp.sum(sims.argmax(-1) == labels)
        return loss, correct

    @jax.jit
    def step(lam, opt_state, wav, labels, rng=None):
        (loss, correct), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            lam, wav, labels, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, lam)
        lam = optax.apply_updates(lam, updates)
        return lam, opt_state, loss, correct

    return step, jax.jit(loss_fn)


def cache_prefix_tokens(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    batches: Iterable,
    until_layer: int,
    *,
    max_len: int = 480000,
    exact_only: bool = False,
    quantize: bool = False,
) -> list | None:
    """Run the frozen encoder prefix (frontend + patch embed + layers below
    the first injected layer) ONCE and cache the tokens host-side — the
    epoch loop then pays only for the suffix.

    ``exact_only=True``: returns ``None`` as soon as a batch is longer than
    ``max_len`` — such clips go through ``rand_trunc``, whose crop varies per
    step in the uncached loop (`data.py:465-468`), so a one-shot cache would
    silently freeze the augmentation. (:func:`train_residual`'s auto path
    pre-scans lengths on a fresh iterator instead, so no prefix compute is
    wasted when a long clip appears late; this flag remains for single-pass
    iterables.)
    ``quantize=True`` applies the eval path's int16 round-trip before
    featurizing (`src/evaluation.py:93`) — use for
    :func:`evaluate_zero_shot` caches (training does not quantize)."""

    @jax.jit
    def prefix(wav):
        if quantize:
            wav = quantize_roundtrip(wav)
        batch = featurize_batch(wav, max_len)
        return clap_mod.encode_audio(
            params, batch, cfg, stop_at_layer=until_layer
        )["tokens"]

    out = []
    for wav, labels in batches:
        if exact_only and np.asarray(wav).shape[-1] > max_len:
            return None
        out.append((np.asarray(prefix(jnp.asarray(wav))), np.asarray(labels)))
    return out


def cache_prefix_images(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    batches: Iterable,
    *,
    max_len: int = 480000,
    quantize: bool = False,
) -> list:
    """Run frontend + bn0 + ``reshape_wav2img`` ONCE and cache the
    [B, H, W, 1] images host-side (VERDICT r4 item 3).

    The cut that pays at ``inject_layers=[0]`` — the reference's published
    best config (PDF Table 1), where :func:`cache_prefix_tokens` is gated
    off (layer-0 TOKENS [4096, 96] outweigh the waveform): the full-size
    image is 65k floats/clip vs the 480k-sample waveform, 7.3x fewer
    host->device bytes per step, and every epoch skips the frontend +
    bicubic (~52 of 334 us/clip on the perf map) while all token-level
    compute (and the λ gradient) stays live. Exactness: the cached resume
    is the SAME ops from the image on — caller must pre-check clip lengths
    like the token path (rand_trunc crops must stay fresh)."""

    @jax.jit
    def prefix(wav):
        if quantize:
            wav = quantize_roundtrip(wav)
        batch = featurize_batch(wav, max_len)
        return clap_mod.encode_audio(params, batch, cfg, stop_at_image=True)["image"]

    return [
        (np.asarray(prefix(jnp.asarray(wav))), np.asarray(labels))
        for wav, labels in batches
    ]


def train_residual(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    train_batches: Callable[[], Iterable],
    text_embeds: jnp.ndarray,
    residual: dict,
    *,
    epochs: int = 10,
    lr: float = 0.01,
    max_len: int = 480000,
    double_ffn_compat: bool = True,
    log_fn: Callable[[dict], None] | None = None,
    cache_prefix: bool | None = None,
    seed: int = 0,
) -> tuple[dict, list[dict]]:
    """Train λ (`src/training.py:12-41` + Adam as `evaluation.py:54`).

    ``train_batches()`` yields ``(wav [B, T], labels [B])`` numpy pairs.
    Returns the trained residual dict and the per-epoch history.
    ``cache_prefix`` precomputes the frozen encoder prefix once, so each
    epoch pays only the suffix (SURVEY hard part #6; the reference re-ran
    the whole frozen encoder every epoch). Two cuts, picked by the first
    injected layer: layers >= 1 cache the TOKENS below that layer
    (:func:`cache_prefix_tokens`); layer 0 — the published best config —
    caches the post-frontend IMAGE instead (:func:`cache_prefix_images`;
    layer-0 tokens [N, 4096, 96] would be BIGGER than the waveform, the
    [256, 256, 1] image is 7.3x smaller and still skips the frontend +
    bicubic every step). Default ``None`` = auto: cache whenever
    featurization is deterministic (all clips <= max_len; `rand_trunc`
    datasets keep fresh per-step crops — see :func:`cache_prefix_tokens`).
    ``True`` forces caching (crops freeze on >max_len clips), ``False``
    disables. A per-step rng (folded from ``seed``) reaches featurization
    in the uncached loop, so ``rand_trunc`` crops differ across steps.
    """
    lam, frozen = _split_residual(residual)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(lam)
    start_layer = 0
    if cache_prefix is None:
        # length pre-scan on a fresh iterator (host-side shapes only): a
        # >max_len clip anywhere disables caching (rand_trunc crops must stay
        # fresh per step) — checking before the device pass means a late long
        # clip can no longer throw away an epoch's worth of prefix compute
        cache_prefix = all(
            np.asarray(wav).shape[-1] <= max_len for wav, _ in train_batches()
        )
    if cache_prefix:
        if min(frozen) >= 1:
            cached = cache_prefix_tokens(
                params, cfg, train_batches(), min(frozen), max_len=max_len
            )
            start_layer = min(frozen)
        else:
            cached = cache_prefix_images(
                params, cfg, train_batches(), max_len=max_len
            )
        train_batches = lambda: iter(cached)  # noqa: E731
    step, _ = make_zero_shot_step(
        params, cfg, text_embeds, frozen, optimizer,
        max_len=max_len, double_ffn_compat=double_ffn_compat,
        start_layer=start_layer,
        tokens_input=cache_prefix and start_layer > 0,
        image_input=cache_prefix and start_layer == 0,
    )
    history = []
    base_rng = jax.random.PRNGKey(seed)
    global_step = 0
    for e in range(epochs):
        total_loss, correct, total = 0.0, 0, 0
        for wav, labels in train_batches():
            wav = jnp.asarray(wav)
            labels = jnp.asarray(labels)
            srng = None if cache_prefix else jax.random.fold_in(base_rng, global_step)
            lam, opt_state, loss, c = step(lam, opt_state, wav, labels, rng=srng)
            global_step += 1
            bs = wav.shape[0]
            total_loss += float(loss) * bs
            correct += int(c)
            total += bs
        rec = {"epoch": e, "train_loss": total_loss / max(total, 1), "train_acc": correct / max(total, 1)}
        history.append(rec)
        if log_fn:
            log_fn(rec)
    return _merge_residual(lam, frozen), history


def evaluate_zero_shot(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    batches: Iterable,
    text_embeds: jnp.ndarray,
    *,
    residual: dict | None = None,
    max_len: int = 480000,
    double_ffn_compat: bool = True,
    quantize: bool = True,
    start_layer: int = 0,
    image_input: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (predictions, targets, similarities); int16 round-trip applied like
    the reference eval path (`src/evaluation.py:93` + `hook.py:180-184`).

    ``start_layer > 0``: batches carry cached frozen-prefix TOKENS (see
    :func:`cache_prefix_tokens` — built from quantized waveforms for this
    eval path) instead of waveforms; ``image_input``: cached post-frontend
    IMAGES (:func:`cache_prefix_images`, the layer-0 cut). Both always
    exact, since eval featurizes without a crop rng."""

    @jax.jit
    def embed(wav):
        if start_layer > 0:
            batch = {"tokens": wav}
        elif image_input:
            batch = {"image": wav}
        else:
            if quantize:
                wav = quantize_roundtrip(wav)
            batch = featurize_batch(wav, max_len)
        out = clap_mod.encode_audio(
            params, batch, cfg, residual=residual,
            double_ffn_compat=double_ffn_compat, start_layer=start_layer,
        )
        return out["normalized"]

    sims_all, targets_all = [], []
    for wav, labels in batches:
        sims = np.asarray(embed(jnp.asarray(wav)) @ text_embeds.T)
        sims_all.append(sims)
        targets_all.append(np.asarray(labels))
    similarities = np.concatenate(sims_all)
    targets = np.concatenate(targets_all)
    return similarities.argmax(-1), targets, similarities


def _kfold_npz(save_file, preds, targets, sims):
    os.makedirs(os.path.dirname(save_file), exist_ok=True)
    np.savez_compressed(
        save_file, similarities=sims, predictions=np.asarray(preds), targets=np.asarray(targets)
    )


def train_and_evaluate_residual(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    dataset_name: str,
    folds: list,
    text_embeds: jnp.ndarray,
    pca_path: str,
    save_dir: str,
    *,
    epochs: int = 10,
    lr: float = 0.01,
    inject_layers: tuple[int, ...] = (0,),
    double_ffn_compat: bool = True,
    save_lambda: bool = True,
    max_len: int | None = None,
    cache_prefix: bool | None = None,
) -> list[dict]:
    """K-fold CV harness (`src/evaluation.py:19-71`): per fold, load the
    per-(layer, fold) PCA basis, train λ, evaluate, save the ``.npz``
    artifact (same schema) — plus the trained λ (fixing the reference's
    persistence gap). ``cache_prefix=None`` auto-caches the frozen prefix
    when exact (see :func:`train_residual`).

    ``max_len`` defaults to ``cfg.audio.clip_samples`` so every stage
    featurizes at the length the model (and any PCA basis fit through it)
    actually consumes — the reference hardcodes 480000 (`residual.py:218`),
    which is only correct for the full-size config."""
    if max_len is None:
        max_len = cfg.audio.clip_samples
    layers_str = "_".join(map(str, inject_layers))
    out_dir = os.path.join(save_dir, dataset_name, "ResiDual")
    results = []
    for i, (train_batches, val_batches) in enumerate(folds):
        residual = {
            l: load_residual_params(
                os.path.join(pca_path, dataset_name, f"layer_{l}_evalfold_{i}")
            )
            for l in inject_layers
        }
        trained, history = train_residual(
            params, cfg, train_batches, text_embeds, residual,
            epochs=epochs, lr=lr, double_ffn_compat=double_ffn_compat,
            max_len=max_len, cache_prefix=cache_prefix,
        )
        preds, targets, sims = evaluate_zero_shot(
            params, cfg, val_batches(), text_embeds,
            residual=trained, double_ffn_compat=double_ffn_compat,
            max_len=max_len,
        )
        save_file = os.path.join(out_dir, f"layers_{layers_str}_evalfold_{i}.npz")
        _kfold_npz(save_file, preds, targets, sims)
        if save_lambda:
            for l, r in trained.items():
                save_residual_params(
                    os.path.join(out_dir, f"lambda_layer{l}_evalfold_{i}.pkl"), r
                )
        acc = float((preds == targets).mean())
        results.append({"fold": i, "accuracy": acc, "history": history})
    return results


def evaluate_baseline_clap(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    dataset_name: str,
    folds: list,
    text_embeds: jnp.ndarray,
    save_dir: str,
    max_len: int | None = None,
) -> list[dict]:
    """Zero-shot baseline per fold (`src/evaluation.py:112-128`)."""
    if max_len is None:
        max_len = cfg.audio.clip_samples
    out_dir = os.path.join(save_dir, dataset_name, "Baseline")
    results = []
    for i, (_, val_batches) in enumerate(folds):
        preds, targets, sims = evaluate_zero_shot(
            params, cfg, val_batches(), text_embeds, max_len=max_len
        )
        _kfold_npz(os.path.join(out_dir, f"evalfold_{i}.npz"), preds, targets, sims)
        results.append({"fold": i, "accuracy": float((preds == targets).mean())})
    return results


def train_with_config(
    config: dict,
    params: dict,
    cfg: clap_mod.CLAPConfig,
    dataset_name: str,
    folds: list,
    text_embeds: jnp.ndarray,
    pca_path: str,
    *,
    log_fn: Callable[[dict], None] | None = None,
) -> dict:
    """Single sweep-run (`src/training.py:72-140`): pick eval fold, load
    per-(layer, fold) PCA, train, track best val accuracy. ``config`` keys:
    ``lr``, ``epochs``, ``inject_layers``, ``eval_fold``; compatible with the
    reference's W&B sweep grid (nb2 cell 15). ``config["max_len"]`` defaults
    to ``cfg.audio.clip_samples`` (the length the encoder consumes)."""
    max_len = config.get("max_len", cfg.audio.clip_samples)
    fold = config.get("eval_fold", 0)
    inject_layers = tuple(config.get("inject_layers", (0,)))
    train_batches, val_batches = folds[fold]
    residual = {
        l: load_residual_params(os.path.join(pca_path, dataset_name, f"layer_{l}_evalfold_{fold}"))
        for l in inject_layers
    }
    best_val_acc = 0.0
    lam, frozen = _split_residual(residual)
    optimizer = optax.adam(config.get("lr", 0.01))
    opt_state = optimizer.init(lam)
    # frozen-prefix cache for the sweep's hot loop (SURVEY §3.3: full HTSAT
    # forward x epochs x folds x grid). This loop steps without a featurize
    # rng (crops are fixed), so caching is always exact. Layers >= 1 cache
    # tokens below the first injection; layer 0 — the sweep grid's winning
    # config — caches the post-frontend image (see train_residual).
    start_layer = 0
    image_input = False
    if min(frozen) >= 1:
        cached = cache_prefix_tokens(
            params, cfg, train_batches(), min(frozen), max_len=max_len
        )
        start_layer = min(frozen)
        # eval side too: the per-epoch val embed below min(frozen) is
        # λ-independent and eval is deterministic (quantized featurize, no
        # crop rng) — cache it once, each epoch pays only the suffix
        val_cached = cache_prefix_tokens(
            params, cfg, val_batches(), start_layer, max_len=max_len,
            quantize=True,
        )
    else:
        image_input = True
        cached = cache_prefix_images(params, cfg, train_batches(), max_len=max_len)
        val_cached = cache_prefix_images(
            params, cfg, val_batches(), max_len=max_len, quantize=True
        )
    train_batches = lambda: iter(cached)  # noqa: E731
    val_batches = lambda: iter(val_cached)  # noqa: E731
    step, loss_fn = make_zero_shot_step(params, cfg, text_embeds, frozen, optimizer,
                                        max_len=max_len, start_layer=start_layer,
                                        tokens_input=start_layer > 0,
                                        image_input=image_input)
    history = []
    for e in range(config.get("epochs", 10)):
        tl, tc, tn = 0.0, 0, 0
        for wav, labels in train_batches():
            lam, opt_state, loss, c = step(lam, opt_state, jnp.asarray(wav), jnp.asarray(labels))
            tl += float(loss) * len(labels)
            tc += int(c)
            tn += len(labels)
        preds, targets, _ = evaluate_zero_shot(
            params, cfg, val_batches(), text_embeds,
            residual=_merge_residual(lam, frozen), max_len=max_len,
            start_layer=start_layer, image_input=image_input,
        )
        val_acc = float((preds == targets).mean())
        best_val_acc = max(best_val_acc, val_acc)
        rec = {
            "epoch": e,
            "train_loss": tl / max(tn, 1),
            "train_acc": tc / max(tn, 1),
            "val_acc": val_acc,
            "lambda_hist": {l: np.asarray(v) for l, v in lam.items()},
        }
        history.append(rec)
        if log_fn:
            log_fn(rec)
    return {"best_val_acc": best_val_acc, "history": history, "residual": _merge_residual(lam, frozen)}
