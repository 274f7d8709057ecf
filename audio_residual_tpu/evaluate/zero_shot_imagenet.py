"""ImageNet-legacy zero-shot evaluation (open_clip lineage).

Reference: `training/zero_shot.py:13-91` + the 1000-class / 80-template
tables in `training/imagenet_zeroshot_data.py` (its header says "currently
not supported for CLAP" — it is dead code there; rebuilt here so the
inventory is complete and the prompt-ensembling classifier is usable for
any text tower). TPU-shaped differences:

- the classifier builder embeds ALL templates of a class in one batched,
  jitted `encode_text` call instead of a per-class python loop of 80
  forwards;
- `run_zero_shot` consumes any iterable of (images [B, H, W, 3] NHWC,
  labels) batches and a jitted `encode_image` callable — no DDP
  `model.module` unwrapping (mesh sharding handles scale-out);
- accuracy is computed with one argsort on device-returned logits rather
  than torch topk/eq gymnastics.

The class/template tables ship as data (`class_labels/imagenet_zeroshot.
json`) — they are public OpenAI CLIP constants, same category as the other
label maps.
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np

__all__ = [
    "load_imagenet_zeroshot_data",
    "zero_shot_classifier",
    "accuracy",
    "run_zero_shot",
    "zero_shot_eval",
]

_DATA_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "class_labels",
    "imagenet_zeroshot.json",
)


def load_imagenet_zeroshot_data(path: str | None = None) -> tuple[list[str], list[str]]:
    """-> (1000 classnames, 80 prompt templates with a ``{}`` slot)."""
    with open(path or _DATA_PATH) as f:
        d = json.load(f)
    return d["classnames"], d["templates"]


def zero_shot_classifier(
    encode_text,
    classnames: list[str],
    templates: list[str],
) -> np.ndarray:
    """Prompt-ensembled classifier (`zero_shot.py:13-27`): for each class,
    embed every template, L2-normalise, average, re-normalise. Returns
    ``[embed_dim, n_classes]`` (the reference's column-stacked layout).

    ``encode_text(list[str]) -> [N, D]`` does its own tokenisation — the
    package's ``CLAPModule.get_text_embedding`` fits directly.
    """
    weights = []
    for classname in classnames:
        texts = [t.format(classname) for t in templates]
        emb = np.asarray(encode_text(texts), np.float32)  # [T, D]
        emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        mean = emb.mean(axis=0)
        weights.append(mean / np.linalg.norm(mean))
    return np.stack(weights, axis=1)


def accuracy(logits: np.ndarray, target: np.ndarray, topk=(1,)) -> list[float]:
    """Top-k correct COUNTS (`zero_shot.py:30-33` returns sums, not rates)."""
    logits = np.asarray(logits)
    target = np.asarray(target)
    order = np.argsort(-logits, axis=-1)
    return [float((order[:, :k] == target[:, None]).any(axis=-1).sum()) for k in topk]


def run_zero_shot(encode_image, classifier: np.ndarray, batches) -> tuple[float, float]:
    """-> (top1, top5) rates over ``batches`` of (images NHWC, labels)
    (`zero_shot.py:36-61`; logits scaled by 100 like the reference)."""
    top1 = top5 = n = 0.0
    for images, target in batches:
        feats = np.asarray(encode_image(images), np.float32)
        feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
        logits = 100.0 * feats @ classifier
        a1, a5 = accuracy(logits, target, topk=(1, 5))
        top1 += a1
        top5 += a5
        n += len(np.asarray(target))
    return top1 / n, top5 / n


def zero_shot_eval(
    encode_image,
    encode_text,
    data: dict,
    epoch: int,
    *,
    zeroshot_frequency: int = 1,
    epochs: int = 1,
    classnames: list[str] | None = None,
    templates: list[str] | None = None,
) -> dict:
    """Epoch-gated driver (`zero_shot.py:64-91`): runs on ``imagenet-val`` /
    ``imagenet-v2`` keys when the epoch matches the cadence."""
    if "imagenet-val" not in data and "imagenet-v2" not in data:
        return {}
    if zeroshot_frequency == 0:
        return {}
    if (epoch % zeroshot_frequency) != 0 and epoch != epochs:
        return {}
    if classnames is None or templates is None:
        classnames, templates = load_imagenet_zeroshot_data()
    logging.info("Starting zero-shot imagenet.")
    classifier = zero_shot_classifier(encode_text, classnames, templates)
    results = {}
    if "imagenet-val" in data:
        top1, top5 = run_zero_shot(encode_image, classifier, data["imagenet-val"])
        results["imagenet-zeroshot-val-top1"] = top1
        results["imagenet-zeroshot-val-top5"] = top5
    if "imagenet-v2" in data:
        top1, top5 = run_zero_shot(encode_image, classifier, data["imagenet-v2"])
        results["imagenetv2-zeroshot-val-top1"] = top1
        results["imagenetv2-zeroshot-val-top5"] = top5
    logging.info("Finished zero-shot imagenet.")
    return results
