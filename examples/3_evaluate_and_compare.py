"""Experiment driver 3: evaluate and compare the three CLAP variants.

Script equivalent of `3_Evaluate_and_compare_CLAP_performance.ipynb`:
K-fold evaluation of (a) the pretrained zero-shot baseline, (b) the
ResiDual-injected model, (c) the frozen-encoder linear probe; aggregate
metrics (mean±std accuracy, macro P/R/F1, summed confusion matrix) in the
PDF Table-1 layout.

Run: ``python examples/3_evaluate_and_compare.py --ckpt ... --save-dir eval``
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.data.datasets import DATASETS, class_prompts, get_fold_loaders
from audio_residual_tpu.evaluate.harness import compare_variants
from audio_residual_tpu.module import CLAPModule
from audio_residual_tpu.training.linear_probe import train_and_eval_linear_head
from audio_residual_tpu.training.train_residual import (
    evaluate_baseline_clap,
    train_and_evaluate_residual,
)


def main(argv=None):
    from audio_residual_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--dataset", default="ESC50")
    p.add_argument("--root", default=".")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--pca-path", default="residual_pca")
    p.add_argument("--save-dir", default="eval")
    p.add_argument("--inject-layers", type=int, nargs="+", default=[0])
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--skip", nargs="*", default=[], choices=["baseline", "residual", "linear"])
    args = p.parse_args(argv)

    module = CLAPModule()
    if args.ckpt:
        module.load_ckpt(args.ckpt)
    folds = get_fold_loaders(args.dataset, args.root, args.batch_size)
    text_embeds = jnp.asarray(module.get_text_embedding(class_prompts(args.dataset)))
    n_classes = len(DATASETS[args.dataset]["class_labels"])

    if "baseline" not in args.skip:
        r = evaluate_baseline_clap(module.params, module.cfg, args.dataset, folds, text_embeds, args.save_dir)
        print("baseline:", [f["accuracy"] for f in r])
    if "residual" not in args.skip:
        r = train_and_evaluate_residual(
            module.params, module.cfg, args.dataset, folds, text_embeds,
            args.pca_path, args.save_dir, epochs=args.epochs, lr=args.lr,
            inject_layers=tuple(args.inject_layers),
        )
        print("residual:", [f["accuracy"] for f in r])
    if "linear" not in args.skip:
        r = train_and_eval_linear_head(
            module.params, module.cfg, args.dataset, folds, n_classes, args.save_dir,
        )
        print("linear:", [f["accuracy"] for f in r])

    table = compare_variants(args.save_dir, args.dataset)
    for variant, m in table.items():
        print(
            f"{variant:10s} acc {m['accuracy_mean']:.4f} ± {m['accuracy_std']:.4f} "
            f"(top5 {m.get('top5_accuracy', float('nan')):.4f}, "
            f"F1 {m['f1_macro']:.4f}, folds {m['folds']})"
        )
    with open(f"{args.save_dir}/{args.dataset}_table.json", "w") as f:
        json.dump({k: {kk: vv for kk, vv in v.items() if np.isscalar(vv)} for k, v in table.items()}, f, indent=2)


if __name__ == "__main__":
    main()
