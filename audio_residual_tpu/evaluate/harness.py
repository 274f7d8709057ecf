"""Cross-fold evaluation aggregation + comparison harness.

Reference: `src/evaluation.py:132-198` (``visualize_eval_metrics``: per-fold
.npz loading, aggregate top-1/top-k accuracy, macro P/R/F1, summed confusion
matrix heatmap) and `evaluate/eval_linear_probe.py` (sweep a pretraining
run's checkpoints, track the best probe metrics) / `evaluate/eval_dcase.py`
(caption-retrieval scoring from pickled embeddings).
"""

from __future__ import annotations

import glob
import os
import pickle

import numpy as np

from audio_residual_tpu.evaluate.metrics import classification_metrics, retrieval_metrics

__all__ = ["aggregate_eval_metrics", "compare_variants", "eval_linear_probe_sweep", "eval_dcase"]


def aggregate_eval_metrics(npz_dir: str, pattern: str = "*.npz", topk: int = 5) -> dict:
    """Load all per-fold ``.npz`` artifacts (schema: similarities /
    predictions / targets) and aggregate: mean±std accuracy across folds,
    pooled macro P/R/F1, summed confusion matrix (`evaluation.py:132-198`)."""
    files = sorted(glob.glob(os.path.join(npz_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no npz artifacts under {npz_dir}/{pattern}")
    accs, all_sims, all_targets = [], [], []
    for f in files:
        data = np.load(f)
        sims, targets = data["similarities"], data["targets"]
        accs.append(float((data["predictions"] == targets).mean()))
        all_sims.append(sims)
        all_targets.append(targets)
    sims = np.concatenate(all_sims)
    targets = np.concatenate(all_targets)
    m = classification_metrics(sims, targets, topk=topk)
    m.update(
        {
            "folds": len(files),
            "accuracy_mean": float(np.mean(accs)),
            "accuracy_std": float(np.std(accs)),
            "per_fold_accuracy": accs,
        }
    )
    return m


def compare_variants(save_dir: str, dataset_name: str, variants=("Baseline", "ResiDual", "Linear")) -> dict:
    """Side-by-side table of the three CLAP variants (PDF Table 1 layout)."""
    out = {}
    for v in variants:
        d = os.path.join(save_dir, dataset_name, v)
        if os.path.isdir(d):
            out[v] = aggregate_eval_metrics(d)
    return out


def eval_linear_probe_sweep(
    params_by_ckpt: dict, cfg, folds, n_classes: int, save_dir: str, **probe_kw
) -> dict:
    """For each pretraining checkpoint's params, train + eval a linear probe
    and track the best (`evaluate/eval_linear_probe.py:132-515` semantics)."""
    from audio_residual_tpu.training.linear_probe import train_and_eval_linear_head

    results = {}
    for name, params in params_by_ckpt.items():
        res = train_and_eval_linear_head(
            params, cfg, f"probe_{name}", folds, n_classes, save_dir, **probe_kw
        )
        results[name] = float(np.mean([r["accuracy"] for r in res]))
    best = max(results, key=results.get)
    return {"per_ckpt": results, "best_ckpt": best, "best_acc": results[best]}


def eval_dcase(embeddings_pickle: str) -> dict:
    """DCASE T5-caption retrieval scoring from pickled output embeddings
    (`evaluate/eval_dcase.py:15-150`): expects {audio_features,
    text_features} arrays of matched pairs."""
    with open(embeddings_pickle, "rb") as f:
        blob = pickle.load(f)
    a = np.asarray(blob["audio_features"])
    t = np.asarray(blob["text_features"])
    a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    t = t / np.linalg.norm(t, axis=-1, keepdims=True)
    return retrieval_metrics(a, t)
