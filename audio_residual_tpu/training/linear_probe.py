"""Linear probe on the frozen CLAP audio embedding.

Covers both reference variants:
  * project-level ``HTSATLinearClassifier`` (`src/linear.py:9-32`): frozen
    CLAP 512-d normalised embedding -> Linear(512, n_classes), kaiming-normal
    init, AdamW, CE; K-fold harness saving softmax-similarity ``.npz``
    (`src/linear.py:56-124`);
  * vendored ``LinearProbe`` (`clap_module/linear_probe.py:7-63` +
    `training/lp_main.py`): optional MLP head and unfrozen regimes — here the
    head is a params pytree; "unfrozen" simply means passing the CLAP params
    into the differentiated argument set (exposed via ``freeze=False``).

TPU-native: embeddings for the frozen regime are computed ONCE per fold with
the jitted encoder and cached; the probe then trains at memory bandwidth on
[N, 512] matrices — the reference re-ran the full frozen encoder every epoch.
"""

from __future__ import annotations

import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_residual_tpu.data.featurize import featurize_batch
from audio_residual_tpu.models import clap as clap_mod
from audio_residual_tpu.ops.quantize import quantize_roundtrip
from audio_residual_tpu.training.losses import lp_loss

__all__ = ["init_linear_head", "train_linear_head", "train_and_eval_linear_head", "eval_linear_head"]


def init_linear_head(key: jax.Array, in_dim: int = 512, n_classes: int = 50, mlp: bool = False) -> dict:
    """Kaiming-normal weight, zero bias (`src/linear.py:19-21`); optional MLP
    head (Linear-ReLU-Linear, the `--lp-mlp` variant)."""
    if not mlp:
        std = np.sqrt(2.0 / in_dim)
        return {"out": {"kernel": std * jax.random.normal(key, (in_dim, n_classes)), "bias": jnp.zeros((n_classes,))}}
    k1, k2 = jax.random.split(key)
    std = np.sqrt(2.0 / in_dim)
    return {
        "hidden": {"kernel": std * jax.random.normal(k1, (in_dim, in_dim)), "bias": jnp.zeros((in_dim,))},
        "out": {"kernel": std * jax.random.normal(k2, (in_dim, n_classes)), "bias": jnp.zeros((n_classes,))},
    }


def head_apply(head: dict, x: jnp.ndarray, act: str = "None") -> jnp.ndarray:
    """Probe head forward; ``act`` is the ``--lp-act`` output activation
    applied before the loss (`clap_module/linear_probe.py:32-43,60-63`).

    ``prelu`` raises: the reference builds ``nn.PReLU(num_parameters=in_ch)``
    (512 weights) but applies it to the ``out_ch``-sized head output — a
    shape crash for any class count != 512, so there is no working semantics
    to match."""
    if "hidden" in head:
        x = jax.nn.relu(x @ head["hidden"]["kernel"] + head["hidden"]["bias"])
    x = x @ head["out"]["kernel"] + head["out"]["bias"]
    if act in (None, "None"):
        return x
    if act == "relu":
        return jax.nn.relu(x)
    if act == "elu":
        return jax.nn.elu(x)
    if act == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if act == "sigmoid":
        return jax.nn.sigmoid(x)
    if act == "prelu":
        raise NotImplementedError(
            "--lp-act prelu: the reference's PReLU(num_parameters=in_ch) "
            "cannot be applied to the [B, n_classes] head output "
            "(clap_module/linear_probe.py:38-39 shape bug)"
        )
    raise ValueError(f"unknown --lp-act {act!r}")


def embed_dataset(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    batches: Iterable,
    *,
    max_len: int = 480000,
    quantize: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Frozen-encoder embeddings for a whole split, computed once."""

    @jax.jit
    def embed(wav):
        if quantize:
            wav = quantize_roundtrip(wav)
        return clap_mod.encode_audio(params, featurize_batch(wav, max_len), cfg)["normalized"]

    feats, labels = [], []
    for wav, y in batches:
        feats.append(np.asarray(embed(jnp.asarray(wav))))
        labels.append(np.asarray(y))
    return np.concatenate(feats), np.concatenate(labels)


def train_linear_head(
    key: jax.Array,
    feats: np.ndarray,
    labels: np.ndarray,
    n_classes: int,
    *,
    epochs: int = 20,
    lr: float = 1e-3,
    weight_decay: float = 0.01,
    batch_size: int = 64,
    mlp: bool = False,
    loss_kind: str = "ce",
    mixup_alpha: float = 0.0,
    act: str = "None",
) -> tuple[dict, list[dict]]:
    """AdamW on the head only (`src/linear.py:68-74`).

    ``mixup_alpha`` > 0 enables the ``--mixup`` augmentation of the
    reference LP loop (`lp_train.py:86-91`, fixed alpha 0.5 there): labels
    are softened with ``do_mixup`` exactly as the reference does. The input
    side is mixed on the cached *embeddings* rather than the waveform — the
    embed-once frozen-encoder cache (this module's TPU-native design)
    precludes re-encoding mixed waveforms each step; this is the
    manifold-mixup variant of the same regulariser.
    """
    from audio_residual_tpu.utils.misc import do_mixup, get_mix_lambda

    if mixup_alpha:
        import logging

        logging.warning(
            "--mixup on the linear probe mixes cached EMBEDDINGS "
            "(manifold mixup), not waveforms like the reference "
            "(lp_train.py:86-91): label softening is exact, input-side "
            "results are not numerically comparable to the reference run"
        )
    head = init_linear_head(key, feats.shape[-1], n_classes, mlp=mlp)
    optimizer = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = optimizer.init(head)

    @jax.jit
    def step(head, opt_state, x, y):
        def f(h):
            return lp_loss(head_apply(h, x, act), y, loss_kind)

        loss, grads = jax.value_and_grad(f)(head)
        updates, opt_state = optimizer.update(grads, opt_state, head)
        return optax.apply_updates(head, updates), opt_state, loss

    n = feats.shape[0]
    rng = np.random.default_rng(0)
    labels_soft = labels
    if mixup_alpha and labels.ndim == 1:  # int labels -> one-hot for mixing
        labels_soft = np.eye(n_classes, dtype=np.float32)[labels]
    history = []
    for e in range(epochs):
        perm = rng.permutation(n)
        total = 0.0
        for i in range(0, n, batch_size):
            idx = perm[i : i + batch_size]
            x = jnp.asarray(feats[idx])
            y = jnp.asarray(labels_soft[idx])
            if mixup_alpha:
                lam = jnp.asarray(get_mix_lambda(mixup_alpha, len(idx), rng))
                x = do_mixup(x, lam)
                y = do_mixup(y, lam)
            head, opt_state, loss = step(head, opt_state, x, y)
            total += float(loss) * len(idx)
        history.append({"epoch": e, "train_loss": total / n})
    return head, history


def eval_linear_head(head: dict, feats: np.ndarray, labels: np.ndarray,
                     act: str = "None"):
    """-> (predictions, targets, softmax similarities) (`src/linear.py:97-124`)."""
    logits = head_apply(head, jnp.asarray(feats), act)
    sims = np.asarray(jax.nn.softmax(logits, axis=-1))
    return sims.argmax(-1), labels, sims


def train_and_eval_linear_head(
    params: dict,
    cfg: clap_mod.CLAPConfig,
    dataset_name: str,
    folds: list,
    n_classes: int,
    save_dir: str,
    *,
    epochs: int = 20,
    lr: float = 1e-3,
    mlp: bool = False,
    seed: int = 0,
    max_len: int | None = None,
) -> list[dict]:
    """K-fold linear-probe harness (`src/linear.py:56-94`), same ``.npz``
    schema as the ResiDual/baseline evals. ``max_len`` defaults to
    ``cfg.audio.clip_samples`` (the length the encoder consumes)."""
    if max_len is None:
        max_len = cfg.audio.clip_samples
    out_dir = os.path.join(save_dir, dataset_name, "Linear")
    os.makedirs(out_dir, exist_ok=True)
    results = []
    for i, (train_batches, val_batches) in enumerate(folds):
        tr_x, tr_y = embed_dataset(params, cfg, train_batches(), max_len=max_len)
        va_x, va_y = embed_dataset(params, cfg, val_batches(), max_len=max_len)
        head, history = train_linear_head(
            jax.random.PRNGKey(seed + i), tr_x, tr_y, n_classes, epochs=epochs, lr=lr, mlp=mlp
        )
        preds, targets, sims = eval_linear_head(head, va_x, va_y)
        np.savez_compressed(
            os.path.join(out_dir, f"evalfold_{i}.npz"),
            similarities=sims, predictions=preds, targets=targets,
        )
        results.append({"fold": i, "accuracy": float((preds == targets).mean()), "history": history})
    return results
