"""One-command full-workflow artifact: the complete ResiDual experiment.

Composes the reference's entire experiment pipeline end-to-end — the three
notebooks chained (`2_Apply_ResiDual_to_CLAP.ipynb` cells 12-24 +
`3_Evaluate_and_compare_CLAP_performance.ipynb` cells 9-18 /
`src/evaluation.py:19-198`):

  1. residual-stream PCA per (layer, fold)          (`src/residual.py:103-159`)
  2. ResiDual injection + zero-shot λ-training      (`src/training.py:12-41`)
  3. K-fold eval, ``.npz`` artifacts + trained λ    (`src/evaluation.py:19-71`)
  4. zero-shot baseline eval                        (`src/evaluation.py:112-128`)
  5. frozen-encoder linear probe                    (`src/linear.py:56-124`)
  6. aggregate metrics + confusion heatmap + λ hist (`src/evaluation.py:132-198`)

Runs on a synthetic class-template dataset (no downloads), with either the
full HTSAT-tiny+RoBERTa CLAP (default; random weights unless ``--ckpt``) or
a CPU-sized tiny model (``--size tiny``, what the test suite asserts).
Emits ONE summary line ``WORKFLOW {json}``.

Run: ``python examples/full_workflow.py --size tiny --folds 2 --epochs 2``
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_model(size: str, seed: int, ckpt: str | None):
    import jax

    from audio_residual_tpu.models import clap as clap_mod

    if size == "full":
        from audio_residual_tpu.models import factory

        params, cfg, _ = factory.create_model("HTSAT-tiny", "roberta", ckpt, seed=seed)
        context = 77
    else:
        from audio_residual_tpu.models.htsat import HTSATConfig
        from audio_residual_tpu.models.roberta import RobertaConfig

        cfg = clap_mod.CLAPConfig(
            embed_dim=64,
            joint_embed_shape=32,
            audio=HTSATConfig(
                spec_size=64, mel_bins=16, embed_dim=32, depths=(1, 1),
                num_heads=(2, 4), clip_samples=24000, num_classes=17,
            ),
            text=RobertaConfig(
                vocab_size=101, hidden_size=32, num_layers=2, num_heads=4,
                intermediate_size=64, max_position_embeddings=40,
            ),
        )
        params = clap_mod.init_clap_params(jax.random.PRNGKey(seed), cfg)
        context = 16
    return params, cfg, context


def synth_folds(n_classes: int, n_folds: int, per_split: int, clip_len: int, seed: int):
    """Class-template synthetic audio: per-class fixed waveform + noise, so
    embeddings are class-separable even under random encoder weights (the
    linear probe must beat the random-text zero-shot baseline)."""
    rng = np.random.default_rng(seed)
    templates = (rng.standard_normal((n_classes, clip_len)) * 0.1).astype(np.float32)

    def make_split(split_seed):
        r = np.random.default_rng(split_seed)
        labels = r.integers(0, n_classes, per_split)
        wav = templates[labels] + (r.standard_normal((per_split, clip_len)) * 0.01).astype(
            np.float32
        )

        def gen():
            yield wav.astype(np.float32), labels

        return gen

    return [
        (make_split(1000 + i), make_split(2000 + i)) for i in range(n_folds)
    ]


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--size", choices=["tiny", "full"], default="full")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--out-dir", default="/tmp/full_workflow")
    p.add_argument("--n-classes", type=int, default=5)
    p.add_argument("--folds", type=int, default=2)
    p.add_argument("--per-split", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--layers", type=int, nargs="+", default=[0])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from audio_residual_tpu.data.featurize import featurize_batch
    from audio_residual_tpu.evaluate.harness import (
        compare_variants,
        plot_lambda_histogram,
        visualize_eval_metrics,
    )
    from audio_residual_tpu.models import clap as clap_mod
    from audio_residual_tpu.residual.analyze import compute_pca_components
    from audio_residual_tpu.training.linear_probe import train_and_eval_linear_head
    from audio_residual_tpu.training.train_residual import (
        evaluate_baseline_clap,
        train_and_evaluate_residual,
    )
    from audio_residual_tpu.utils.cache import enable_compile_cache
    from audio_residual_tpu.utils.tokenizer import HashTokenizer, load_default_tokenizer

    enable_compile_cache()
    t0 = time.time()
    ds_name = "SYNTH"
    out_dir, pca_dir = os.path.join(args.out_dir, "eval"), os.path.join(args.out_dir, "pca")
    os.makedirs(os.path.join(pca_dir, ds_name), exist_ok=True)

    params, cfg, context = build_model(args.size, args.seed, args.ckpt)
    max_len = cfg.audio.clip_samples
    clip_len = max_len // 2  # exercises the repeatpad featurize branch
    folds = synth_folds(args.n_classes, args.folds, args.per_split, clip_len, args.seed)

    # class-label text embeddings via the model's own text tower
    # (`hook.get_text_embedding` role; HashTokenizer for the assetless tiny)
    prompts = [f"This is a sound of class {i}." for i in range(args.n_classes)]
    tok = (
        HashTokenizer(cfg.text.vocab_size, context)
        if args.size == "tiny"
        else load_default_tokenizer(context)
    )
    enc = tok(prompts)
    text_embeds = clap_mod.encode_text(
        params, jnp.asarray(enc["input_ids"]), jnp.asarray(enc["attention_mask"]), cfg
    )

    # ---- stage 1: residual-stream PCA per (layer, fold) -------------------
    @jax.jit
    def encode_taps(wav):
        return clap_mod.encode_audio(
            params, featurize_batch(wav, max_len), cfg, taps=("residual",)
        )

    for fold in range(args.folds):
        train_batches, _ = folds[fold]
        for layer in args.layers:
            compute_pca_components(
                encode_taps,
                (w for w, _ in train_batches()),
                layer,
                cfg.audio.layer_dim(layer),
                save_path=os.path.join(
                    pca_dir, ds_name, f"layer_{layer}_evalfold_{fold}"
                ),
            )

    # ---- stages 2+3: inject + λ-train + K-fold eval .npz ------------------
    residual_results = train_and_evaluate_residual(
        params, cfg, ds_name, folds, text_embeds, pca_dir, out_dir,
        epochs=args.epochs, lr=args.lr, inject_layers=tuple(args.layers),
    )

    # ---- stage 4: zero-shot baseline --------------------------------------
    baseline_results = evaluate_baseline_clap(
        params, cfg, ds_name, folds, text_embeds, out_dir
    )

    # ---- stage 5: frozen-encoder linear probe -----------------------------
    linear_results = train_and_eval_linear_head(
        params, cfg, ds_name, folds, args.n_classes, out_dir,
        epochs=max(args.epochs * 5, 10), lr=1e-2,
    )

    # ---- stage 6: aggregate metrics + figures -----------------------------
    layers_str = "_".join(map(str, args.layers))
    res_dir = os.path.join(out_dir, ds_name, "ResiDual")
    cm_fig = os.path.join(out_dir, "residual_confusion.png")
    res_metrics = visualize_eval_metrics(
        res_dir, ds_name, args.folds, inject_layers=list(args.layers), fig_path=cm_fig
    )
    import pickle

    lam_fig = os.path.join(out_dir, "lambda_hist.png")
    with open(os.path.join(res_dir, f"lambda_layer{args.layers[0]}_evalfold_0.pkl"), "rb") as f:
        lam0 = pickle.load(f)["lam"]
    plot_lambda_histogram(np.asarray(lam0), lam_fig)
    table = compare_variants(out_dir, ds_name)

    acc = lambda rs: float(np.mean([r["accuracy"] for r in rs]))  # noqa: E731
    summary = {
        "ok": True,
        "size": args.size,
        "dataset": ds_name,
        "folds": args.folds,
        "inject_layers": args.layers,
        "seconds": round(time.time() - t0, 2),
        "baseline_acc": acc(baseline_results),
        "residual_acc": acc(residual_results),
        "linear_acc": acc(linear_results),
        "residual_metrics": {
            k: float(v)
            for k, v in res_metrics.items()
            if np.isscalar(v) and not isinstance(v, str)
        },
        "train_loss_first": residual_results[0]["history"][0]["train_loss"],
        "train_loss_last": residual_results[0]["history"][-1]["train_loss"],
        "lambda_moved": bool(not np.allclose(np.asarray(lam0), 1.0)),
        "artifacts": {
            "npz": sorted(os.listdir(res_dir)),
            "confusion_fig": os.path.getsize(cm_fig),
            "lambda_fig": os.path.getsize(lam_fig),
        },
    }
    # structural sanity: λ trained, losses finite, the probe separates the
    # template classes the random-text baseline cannot
    summary["ok"] = bool(
        summary["lambda_moved"]
        and np.isfinite(summary["train_loss_last"])
        and summary["linear_acc"] >= summary["baseline_acc"]
    )
    print("WORKFLOW " + json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
