"""Contrastive training CLI — ``python -m audio_residual_tpu.training.main``.

Reference: `training/main.py:125-596` — seeding, experiment naming, log/ckpt
dirs, distributed init, model build, optimizer groups, cosine schedule,
resume, epoch loop with eval + top-K checkpoint rotation, params.txt dump,
codebase copy.

TPU-native differences: no per-rank process spawn — one process drives the
whole mesh (``jax.distributed.initialize()`` for multi-host); no GradScaler
(bf16 needs no loss scaling); DDP wrap / SyncBN are subsumed by pjit DP.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from audio_residual_tpu.data.shards import ShardedAudioText, resolve_tar_paths, sample_prop
from audio_residual_tpu.data.toy import ToyDataset
from audio_residual_tpu.models import factory
from audio_residual_tpu.parallel.mesh import data_parallel_mesh, replicate, shard_batch
from audio_residual_tpu.training import checkpoints
from audio_residual_tpu.training.logger import AverageMeter, MetricLogger, setup_logging
from audio_residual_tpu.training.params import parse_args
from audio_residual_tpu.training.train_clap import (
    init_train_state,
    make_optimizer,
    make_split_optimizer,
    make_train_step,
)
from audio_residual_tpu.utils.misc import load_class_label, prefetch_batches
from audio_residual_tpu.utils.tokenizer import load_default_tokenizer

__all__ = ["main"]


def copy_codebase(args, log_base: str) -> None:
    """Snapshot the package into the run dir (`main.py:576-593`)."""
    import audio_residual_tpu

    src = os.path.dirname(audio_residual_tpu.__file__)
    dst = os.path.join(log_base, "code", "audio_residual_tpu")
    if not os.path.exists(dst):
        shutil.copytree(src, dst)


def _experiment_name(args) -> str:
    if args.name:
        return args.name
    return "-".join(
        [
            datetime.now().strftime("%Y_%m_%d-%H_%M_%S"),
            f"model_{args.amodel}",
            f"lr_{args.lr}",
            f"b_{args.batch_size}",
        ]
    )


def _toy_batches_fn(path, args, audio_cfg, tokenize, *, is_train=True):
    from audio_residual_tpu.data.toy import make_toy_h5

    if not os.path.exists(path):
        make_toy_h5(path, clip_samples=audio_cfg["clip_samples"])
    # `--train-ipc`/`--val-ipc` (`data.py:815`): per-class index npy for the
    # balanced queue; None derives the same structure from the h5 targets
    ipc = args.train_ipc if is_train else args.val_ipc
    ds = ToyDataset(path, ipc_path=ipc, eval_mode=not is_train)

    def epochs(epoch=0):
        for b in ds.batches(args.batch_size):
            enc = tokenize(b["text"])
            yield {
                "waveform": b["waveform"],
                "input_ids": np.asarray(enc["input_ids"]),
                "attention_mask": np.asarray(enc["attention_mask"]),
            }

    return epochs


def _resolve_split_tars(root, names, splits, *, full_dataset=None):
    """Merge shard discovery over several split names (the reference's
    ``get_tar_path_from_dataset_name``, `clap_module/utils.py:113-151`:
    missing splits are simply skipped; a name in ``full_dataset`` trains on
    ALL of its splits per the ``dataset_split`` table)."""
    from audio_residual_tpu.utils.misc import dataset_split

    paths, sizes = [], {}
    for n in names:
        name_splits = dataset_split.get(n, splits) if (
            full_dataset and n in full_dataset
        ) else splits
        for s in name_splits:
            pp, ss = resolve_tar_paths(root, [n], s)
            paths += pp
            sizes.update(ss)
    return paths, sizes


def build_data(args, model_cfg, tokenize):
    """``get_data`` dispatcher (`data.py:850-900`) ->
    ``(train_epochs_fn, total_train_samples, val_batches_fn | None)``."""
    audio_cfg = model_cfg["audio_cfg"]
    # like `data.py:853`: class-index map available to downstream consumers
    args.class_index_dict = load_class_label(args.class_label_path)
    if args.dataset_type == "toy":
        epochs = _toy_batches_fn(args.train_data or "/tmp/toy_train.h5",
                                 args, audio_cfg, tokenize)
        val_fn = None
        if args.val_data:
            val_fn = _toy_batches_fn(args.val_data, args, audio_cfg, tokenize,
                                     is_train=False)
        return epochs, None, val_fn
    if args.dataset_type == "csv":
        # parity with `data.py:846`: the reference parses the csv-* flags but
        # ships no csv dataset path — its own dispatcher raises exactly this
        raise ValueError(f"Unsupported dataset type: {args.dataset_type}")
    # "auto" and "webdataset" both resolve to local tar shards (the
    # reference's default "auto" hits the same `data.py:846` raise — dead by
    # default; here the default works)

    # sharded tar path; train splits come from --datasetinfos
    # (`data.py:855-866`), val from the valid/test/eval splits of the
    # non-excluded dataset names (`data.py:867-883`)
    names = args.datasetnames or ["audioset"]
    infos = args.datasetinfos or ["train", "unbalanced_train", "balanced_train"]
    root = args.datasetpath or args.train_data
    paths, sizes = _resolve_split_tars(
        root, names, infos, full_dataset=args.full_train_dataset
    )
    paths, total = sample_prop(paths, sizes, args.dataset_proportion)

    def pipe(tar_paths, batches_per_epoch):
        return ShardedAudioText(
            tar_paths=tar_paths,
            tokenize=tokenize,
            batch_size=args.batch_size,
            max_len=audio_cfg["clip_samples"],
            data_truncating=args.data_truncating,
            data_filling=args.data_filling,
            audio_cfg=audio_cfg,
            batches_per_epoch=batches_per_epoch,
            text_augment_selection=args.text_augment_selection,
        )

    pipeline = pipe(
        paths,
        (args.train_num_samples // args.batch_size) if args.train_num_samples else None,
    )

    val_fn = None
    excluded = (args.full_train_dataset or []) + (args.exclude_eval_dataset or [])
    val_names = [n for n in names if n not in excluded] if excluded else names
    args.val_dataset_names = val_names
    val_root = args.val_data or root
    val_paths, _ = _resolve_split_tars(val_root, val_names, ["valid", "test", "eval"])
    if val_paths:
        val_pipe = pipe(
            val_paths,
            (args.val_num_samples // args.batch_size) if args.val_num_samples else None,
        )
        # fixed shard order + crops every pass: epoch 0 == deterministic eval
        val_fn = lambda: val_pipe.epoch(0)  # noqa: E731
    return pipeline.epoch, total, val_fn


def _run_validation(params, cfg, val_fn, args, mesh, compute_dtype,
                    epoch, metric_logger):
    """In-training ``evaluate()`` (`train.py:266-501`, the generic-val
    branch): embed the whole val set (batch-sharded over the mesh — the
    `--parallel-eval` semantics by construction), then ``get_metrics`` over
    the full similarity matrix and a ``results.jsonl`` record.

    The reference groups metrics per source-tar dataset via ``__url__``; the
    sharded pipeline here intentionally yields plain batches, so metrics are
    reported for the ``all`` group (which is also what
    ``--top-k-checkpoint-select-dataset``'s default matches)."""
    import functools

    from audio_residual_tpu.evaluate.metrics import clap_val_metrics
    from audio_residual_tpu.models.clap import clap_apply

    mlp = args.clap_mlploss or args.mlp_loss
    embed = jax.jit(functools.partial(
        clap_apply, cfg=cfg, train=False, compute_dtype=compute_dtype
    ))

    keys = ("audio_features", "text_features",
            "audio_features_mlp", "text_features_mlp")
    feats = {k: [] for k in keys}
    scale_a = scale_t = 1.0
    n = 0
    for i, batch in enumerate(val_fn()):
        device_batch = shard_batch(
            mesh,
            {k: v for k, v in batch.items()
             if k in ("waveform", "input_ids", "attention_mask")},
        )
        out = embed(
            params, {"waveform": device_batch["waveform"]},
            device_batch["input_ids"], device_batch.get("attention_mask"),
        )
        for k in keys:
            feats[k].append(np.asarray(out[k]))
        scale_a, scale_t = float(out["logit_scale_a"]), float(out["logit_scale_t"])
        n += int(batch["waveform"].shape[0])
        if i % 100 == 0:
            logging.info("Eval Epoch: %d [%d samples]", epoch, n)
    if n == 0:
        return {}
    cat = {k: np.concatenate(v) for k, v in feats.items()}
    m = clap_val_metrics(
        cat["audio_features"], cat["text_features"], scale_a,
        cat["audio_features_mlp"], cat["text_features_mlp"], scale_t,
        mlp_loss=mlp,
    )
    metrics = {f"all/{k}": v for k, v in m.items()}
    metrics["epoch"] = epoch
    logging.info(
        "Eval Epoch: %d %s", epoch,
        "\t".join(f"{k}: {v:.4f}" for k, v in metrics.items()
                  if isinstance(v, float)),
    )
    metric_logger.log({f"val/{k}": v for k, v in metrics.items()}, step=epoch)
    return metrics


def main(argv=None) -> dict:
    args = parse_args(argv)
    np.random.seed(args.seed)

    name = _experiment_name(args)
    log_base = os.path.join(args.logs, name)
    ckpt_dir = os.path.join(log_base, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    setup_logging(
        os.path.join(log_base, "out.log"),
        level=logging.DEBUG if args.debug else logging.INFO,
        include_host=not args.log_local,
    )
    with open(os.path.join(log_base, "params.txt"), "w") as f:  # `main.py:260-265`
        for k in sorted(vars(args)):
            f.write(f"{k}: {getattr(args, k)}\n")
    if args.copy_codebase:
        copy_codebase(args, log_base)

    if args.sleep:
        time.sleep(args.sleep)  # `lp_main.py:296`
    params, cfg, model_cfg = factory.create_model(
        args.amodel, args.tmodel, args.pretrained,
        enable_fusion=args.enable_fusion, fusion_type=args.fusion_type,
        seed=args.seed, pretrained_audio=args.pretrained_audio,
        pretrained_text=args.pretrained_text,
        force_quick_gelu=args.force_quick_gelu,
    )
    tokenize = load_default_tokenizer(cfg.context_length)
    epochs_fn, total_samples, val_fn = build_data(args, model_cfg, tokenize)

    steps_per_epoch = (
        (total_samples or (args.train_num_samples or 1024)) // args.batch_size
    )
    total_steps = max(steps_per_epoch * args.epochs, 1)
    if args.optimizer == "adam":
        # the reference zeroes every decay when plain adam is selected
        # (`main.py:312-314`)
        args.wd = args.wd_pretrained = args.wd_new = 0.0
    if args.split_opt:
        # per-group hyperparams fall back to the shared ones (`main.py:323-326`)
        for x in ("lr", "beta1", "beta2", "eps"):
            for y in ("_new", "_pretrained"):
                if getattr(args, x + y) is None:
                    setattr(args, x + y, getattr(args, x))
        optimizer = make_split_optimizer(
            lr_pretrained=args.lr_pretrained, lr_new=args.lr_new,
            weight_decay_pretrained=args.wd_pretrained,
            weight_decay_new=args.wd_new,
            warmup=args.warmup, total_steps=total_steps,
            betas_pretrained=(args.beta1_pretrained, args.beta2_pretrained),
            betas_new=(args.beta1_new, args.beta2_new),
            eps_pretrained=args.eps_pretrained, eps_new=args.eps_new,
            name=args.optimizer,
            momentum_pretrained=args.momentum_pretrained,
            momentum_new=args.momentum_new,
            skip_scheduler=args.skip_scheduler,
        )
    else:
        optimizer = make_optimizer(
            lr=args.lr, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
            weight_decay=args.wd, warmup=args.warmup, total_steps=total_steps,
            name=args.optimizer, momentum=args.momentum,
            skip_scheduler=args.skip_scheduler,
        )
    state = init_train_state(params, optimizer)

    mesh = data_parallel_mesh()
    if args.fsdp:
        from audio_residual_tpu.parallel.fsdp import shard_train_state

        state = shard_train_state(state, mesh)
    else:
        state = replicate(mesh, state)
    compute_dtype = jnp.bfloat16 if args.precision in ("amp", "bf16", "fp16") else None
    step_fn = make_train_step(
        cfg, optimizer, mlp_loss=args.clap_mlploss or args.mlp_loss,
        compute_dtype=compute_dtype, freeze_text=args.freeze_text,
        remat=args.remat, fsdp_mesh=mesh if args.fsdp else None,
        weight_loss_kappa=args.kappa,
    )

    start_epoch = 0
    if args.resume:
        state = checkpoints.load_checkpoint(args.resume, state)
        start_epoch = int(np.asarray(state["step"])) // max(steps_per_epoch, 1)
        logging.info("resumed from %s at epoch %d", args.resume, start_epoch)

    wandb_kwargs = {
        "project": "clap", "name": name, "notes": args.wandb_notes,
        "id": args.wandb_id, "resume": "allow" if args.wandb_id else None,
    }
    metric_logger = MetricLogger(
        log_base, tuple(filter(None, args.report_to.split(","))),
        wandb_kwargs=wandb_kwargs,
    )
    rng = jax.random.PRNGKey(args.seed)
    batch_time, data_time = AverageMeter(), AverageMeter()
    global_step = int(np.asarray(state["step"]))
    top_k = {i: (-np.inf) for i in range(args.save_top_performance)} if args.save_top_performance else {}
    last_metrics: dict = {}

    def _validate(epoch):
        return _run_validation(
            state["params"], cfg, val_fn, args, mesh, compute_dtype,
            epoch, metric_logger,
        )

    with mesh:
        # eval before training, and eval-only runs (`main.py:497-501`)
        if val_fn is not None and not args.no_eval and start_epoch == 0:
            last_metrics = _validate(0)
        for epoch in range(start_epoch, args.epochs):
            if args.freeze_text_after >= 0 and epoch == args.freeze_text_after \
                    and not args.freeze_text:
                # freeze text params from this epoch on (`main.py:510-513`)
                logging.info("Text parameters frozen from epoch %d", epoch)
                args.freeze_text = True
                step_fn = make_train_step(
                    cfg, optimizer, mlp_loss=args.clap_mlploss or args.mlp_loss,
                    compute_dtype=compute_dtype, freeze_text=True,
                    remat=args.remat, fsdp_mesh=mesh if args.fsdp else None,
                    weight_loss_kappa=args.kappa,
                )
            end = time.time()
            # `--prefetch-factor`: host decode/featurize runs a bounded
            # queue ahead of the device step (torch DataLoader's knob,
            # `params.py:553-557`; here a background thread)
            for batch in prefetch_batches(epochs_fn(epoch), args.prefetch_factor):
                data_time.update(time.time() - end)
                device_batch = shard_batch(
                    mesh,
                    {k: v for k, v in batch.items() if k in ("waveform", "input_ids", "attention_mask")},
                )
                rng, srng = jax.random.split(rng)
                state, metrics = step_fn(state, device_batch, srng)
                global_step += 1
                batch_time.update(time.time() - end)
                end = time.time()
                if global_step % 100 == 0:
                    loss = float(metrics["loss"])
                    logging.info(
                        "epoch %d step %d loss %.4f scale %.2f batch %.3fs data %.3fs",
                        epoch, global_step, loss, float(metrics["logit_scale_a"]),
                        batch_time.avg, data_time.avg,
                    )
                    metric_logger.log(
                        {"loss": loss, "logit_scale_a": float(metrics["logit_scale_a"]),
                         "epoch": epoch}, step=global_step,
                    )
            completed = epoch + 1
            if val_fn is not None and not args.no_eval and args.val_frequency \
                    and (completed % args.val_frequency == 0 or completed == args.epochs):
                last_metrics = _validate(completed)
                if args.save_top_performance and last_metrics:
                    # mean of the metrics matching the select metric+dataset
                    # (`main.py:526-534`, list->mean in `main.py:50-60`)
                    filtered = [
                        v for k, v in last_metrics.items()
                        if args.top_k_checkpoint_select_metric in k
                        and args.top_k_checkpoint_select_dataset in k
                    ]
                    if filtered:
                        top_k = checkpoints.update_top_k_performance(
                            float(np.mean(filtered)), top_k, ckpt_dir,
                            jax.device_get(state),
                        )
            if completed % args.save_frequency == 0:
                checkpoints.save_checkpoint(ckpt_dir, jax.device_get(state), epoch, name)
            if args.save_most_recent:
                checkpoints.save_most_recent(ckpt_dir, jax.device_get(state))

    return {"state": state, "ckpt_dir": ckpt_dir, "steps": global_step,
            "metrics": last_metrics, "top_k": top_k}


if __name__ == "__main__":
    main()
