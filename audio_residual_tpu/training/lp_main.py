"""Linear-probe training CLI — ``python -m audio_residual_tpu.training.lp_main``.

Reference: `training/lp_main.py:127-643` — same skeleton as the contrastive
CLI but wraps CLAP in a linear probe (`clap_module/linear_probe.py:7-63`):
frozen (or unfrozen) encoder + Linear/MLP head, ``--lp-*`` flag family,
LPLoss (bce/ce/mse) and LPMetrics (mAP/acc/mAUC).

TPU-native: the frozen regime embeds the dataset once with the jitted
encoder and trains the head at memory bandwidth (the reference re-ran the
frozen encoder every epoch).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

from audio_residual_tpu.data.datasets import DATASETS, get_fold_loaders
from audio_residual_tpu.models import factory
from audio_residual_tpu.training.linear_probe import (
    embed_dataset,
    eval_linear_head,
    train_linear_head,
)
from audio_residual_tpu.training.logger import MetricLogger, setup_logging
from audio_residual_tpu.training.losses import lp_metrics
from audio_residual_tpu.training.params import parse_args

__all__ = ["main"]


def main(argv=None) -> dict:
    args = parse_args(argv)
    if args.sleep:
        import time

        time.sleep(args.sleep)  # `lp_main.py:296`
    log_base = os.path.join(args.logs, args.name or "lp_run")
    os.makedirs(log_base, exist_ok=True)
    setup_logging(os.path.join(log_base, "out.log"))
    metric_logger = MetricLogger(log_base, tuple(filter(None, args.report_to.split(","))))

    params, cfg, model_cfg = factory.create_model(
        args.amodel, args.tmodel, args.pretrained,
        enable_fusion=args.enable_fusion, fusion_type=args.fusion_type,
    )

    ds_name = (args.datasetnames or ["ESC50"])[0]
    n_classes = len(DATASETS[ds_name]["class_labels"]) if ds_name in DATASETS else 527
    folds = get_fold_loaders(ds_name, args.datasetpath or ".", args.batch_size)

    if not args.lp_freeze:
        # the reference default fine-tunes the ENCODER with the probe
        # (`lp_main.py:158-175`); this module's embed-once design is
        # frozen-only — say so instead of silently freezing
        logging.warning(
            "--lp-freeze not set: joint encoder fine-tuning is not "
            "implemented (the probe trains on embed-once cached features, "
            "i.e. the lp_freeze=True regime); proceeding frozen"
        )
    wanted = tuple(m.strip() for m in args.lp_metrics.split(","))
    results = []
    for i, (train_batches, val_batches) in enumerate(folds):
        tr_x, tr_y = embed_dataset(params, cfg, train_batches())
        va_x, va_y = embed_dataset(params, cfg, val_batches())
        head, history = train_linear_head(
            jax.random.PRNGKey(args.seed + i), tr_x, tr_y, n_classes,
            epochs=args.epochs, lr=args.lp_lr, mlp=args.lp_mlp,
            loss_kind=args.lp_loss, act=args.lp_act,
            # reference lp_train.py:87 hard-codes alpha 0.5 under --mixup
            mixup_alpha=0.5 if args.mixup else 0.0,
        )
        preds, targets, sims = eval_linear_head(head, va_x, va_y, act=args.lp_act)
        m = lp_metrics(sims, targets, metrics=wanted)
        m["fold"] = i
        results.append(m)
        metric_logger.log(m, step=i)
        logging.info("fold %d: %s", i, m)
    agg = {k: float(np.mean([r[k] for r in results])) for k in wanted}
    logging.info("aggregate: %s", agg)
    return {"per_fold": results, "aggregate": agg}


if __name__ == "__main__":
    main()
