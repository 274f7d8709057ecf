"""Misc model utilities.

Reference: `clap_module/utils.py` — mixup (`:189-208`), frame interpolate
(`:211-224`, in ops/interpolate.py here), frozen batch norm (`:62-100`),
optimizer mux (`:374-389`), class-label loading (`:348-362`), dataset-split
registry (`:14-59`), log re-parser (`:265-300`).
"""

from __future__ import annotations

import json
import pickle
import re

import jax.numpy as jnp
import numpy as np
import optax

__all__ = [
    "get_mix_lambda",
    "do_mixup",
    "get_optimizer",
    "load_class_label",
    "dataset_split",
    "get_data_from_log",
    "prefetch_batches",
]


def prefetch_batches(iterable, depth: int):
    """Background-thread batch prefetch — the host-pipeline counterpart of
    torch DataLoader's ``--prefetch-factor`` (`params.py:553-557`).

    A producer thread drains ``iterable`` into a bounded queue of ``depth``
    batches while the consumer feeds the device, so host-side decode /
    featurize overlaps device compute (the TPU idiom: keep the host ahead of
    the accelerator). Order-preserving; producer exceptions re-raise in the
    consumer. ``depth <= 0`` or ``None`` yields the iterable unchanged.
    """
    if not depth or depth <= 0:
        yield from iterable
        return
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=depth)
    _END, _ERR = object(), object()

    def produce():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            q.put((_ERR, e))
            return
        q.put(_END)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
            raise item[1]
        yield item

# webdataset split registry (`clap_module/utils.py:14-59`): dataset name ->
# available split names used to resolve tar paths.
dataset_split = {
    "audiocaps": ["train", "valid", "test"],
    "audioset": ["balanced_train", "unbalanced_train", "eval"],
    "BBCSoundEffects": ["train", "test"],
    "Clotho": ["train", "test", "valid"],
    "free_to_use_sounds": ["train", "test"],
    "paramount_motion": ["train", "test"],
    "sonniss_game_effects": ["train", "test"],
    "wesoundeffects": ["train", "test"],
    "MACS": ["train", "test"],
    "freesound": ["train", "test"],
    "FSD50K": ["train", "test", "valid"],
    "fsd50k_class_label": ["train", "test", "valid"],
    "esc50": ["train", "test"],
    "ESC50_1": ["train", "test"],
    "ESC50_2": ["train", "test"],
    "ESC50_3": ["train", "test"],
    "ESC50_4": ["train", "test"],
    "ESC50_5": ["train", "test"],
    "audiostock": ["train", "test"],
    "freesound_no_overlap_noesc50": ["train", "test"],
    "epidemic_sound_effects": ["train", "test"],
    "VGGSound": ["train", "test"],
    "urbansound8k_class_label": ["train", "test"],
    "audioset_t5": ["balanced_train", "unbalanced_train", "eval"],
    "epidemic_sound_effects_t5": ["train", "test"],
    "WavText5K": ["train", "test"],
    "esc50_no_overlap": ["train", "test"],
    "usd8k_no_overlap": ["train", "test"],
    "fsd50k_200_class_label": ["train", "test", "valid"],
}


def get_mix_lambda(mixup_alpha: float, batch_size: int, rng: np.random.Generator | None = None):
    """Beta-sampled mixup coefficients (`utils.py:189-193`)."""
    rng = rng or np.random.default_rng()
    return rng.beta(mixup_alpha, mixup_alpha, batch_size).astype(np.float32)


def do_mixup(x: jnp.ndarray, mixup_lambda: jnp.ndarray) -> jnp.ndarray:
    """Mix each sample with the batch-reversed sample (`utils.py:196-208`):
    ``out = x * lam + flip(x) * (1 - lam)``."""
    lam = mixup_lambda.reshape((-1,) + (1,) * (x.ndim - 1))
    return x * lam + jnp.flip(x, axis=0) * (1.0 - lam)


def get_optimizer(params_or_lr, optimizer_name: str = "adamw", **kw) -> optax.GradientTransformation:
    """Optimizer mux (`utils.py:374-389`): adamw / sgd / adam."""
    lr = kw.pop("lr", params_or_lr if isinstance(params_or_lr, float) else 1e-4)
    if optimizer_name == "adamw":
        return optax.adamw(lr, **kw)
    if optimizer_name == "adam":
        return optax.adam(lr, **{k: v for k, v in kw.items() if k != "weight_decay"})
    if optimizer_name == "sgd":
        return optax.sgd(lr, momentum=kw.get("momentum", 0.9))
    raise ValueError(f"optimizer name is not correct: {optimizer_name}")


def load_class_label(path: str | None):
    """Class-label index loader (`utils.py:348-362`): pkl/json/npy/csv ->
    {name: idx} dict or array."""
    if path is None:
        return None
    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            return pickle.load(f)
    if path.endswith(".json"):
        with open(path) as f:
            return json.load(f)
    if path.endswith((".npy", ".npz")):
        return np.load(path, allow_pickle=True)
    if path.endswith(".csv"):
        import pandas as pd

        return pd.read_csv(path)
    raise ValueError(f"unsupported class-label file {path}")


def get_data_from_log(txt_path: str) -> dict:
    """Parse train/eval metrics back out of a log file
    (`utils.py:265-300` semantics: 'key: value' pairs on INFO lines keyed by
    epoch)."""
    out: dict = {}
    epoch = None
    with open(txt_path) as f:
        for line in f:
            m = re.search(r"[Ee]poch[:\s]+(\d+)", line)
            if m:
                epoch = int(m.group(1))
            for key, val in re.findall(r"(\w[\w@/-]*):\s*(-?\d+\.?\d*(?:e-?\d+)?)", line):
                if key.lower() in ("epoch",):
                    continue
                out.setdefault(key, {})[epoch] = float(val)
    return out


def bn_freeze_mask(params) -> dict:
    """Trainability mask that freezes BatchNorm parameters — the functional
    counterpart of ``freeze_batch_norm_2d`` (`clap_module/utils.py:62-100`).
    Use with ``optax.masked`` / zero-lr groups; note that in this framework
    eval-statistics BN is already the inference default, so "freezing" only
    concerns the scale/bias leaves during finetuning."""

    def walk(tree, in_bn=False):
        if isinstance(tree, dict):
            return {k: walk(v, in_bn or str(k).startswith("bn")) for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(walk(v, in_bn) for v in tree)
        return not in_bn  # True = trainable

    return walk(params)
