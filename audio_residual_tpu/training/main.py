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
    make_train_step,
)
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


def build_data(args, model_cfg, tokenize):
    audio_cfg = model_cfg["audio_cfg"]
    if args.dataset_type == "toy":
        from audio_residual_tpu.data.toy import make_toy_h5

        path = args.train_data or "/tmp/toy_train.h5"
        if not os.path.exists(path):
            make_toy_h5(path, clip_samples=audio_cfg["clip_samples"])
        ds = ToyDataset(path)

        def epochs(epoch):
            for b in ds.batches(args.batch_size):
                enc = tokenize(b["text"])
                yield {
                    "waveform": b["waveform"],
                    "input_ids": np.asarray(enc["input_ids"]),
                    "attention_mask": np.asarray(enc["attention_mask"]),
                }

        return epochs, None
    # sharded tar path
    names = args.datasetnames or ["audioset"]
    paths, sizes = resolve_tar_paths(args.datasetpath or args.train_data, names, "train")
    paths, total = sample_prop(paths, sizes, args.dataset_proportion)
    pipeline = ShardedAudioText(
        tar_paths=paths,
        tokenize=tokenize,
        batch_size=args.batch_size,
        max_len=audio_cfg["clip_samples"],
        data_truncating=args.data_truncating,
        data_filling=args.data_filling,
        audio_cfg=audio_cfg,
        batches_per_epoch=(args.train_num_samples // args.batch_size) if args.train_num_samples else None,
        text_augment_selection=args.text_augment_selection,
    )
    return pipeline.epoch, total


def main(argv=None) -> dict:
    args = parse_args(argv)
    np.random.seed(args.seed)

    name = _experiment_name(args)
    log_base = os.path.join(args.logs, name)
    ckpt_dir = os.path.join(log_base, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    setup_logging(os.path.join(log_base, "out.log"), include_host=not args.log_local)
    with open(os.path.join(log_base, "params.txt"), "w") as f:  # `main.py:260-265`
        for k in sorted(vars(args)):
            f.write(f"{k}: {getattr(args, k)}\n")
    if args.copy_codebase:
        copy_codebase(args, log_base)

    params, cfg, model_cfg = factory.create_model(
        args.amodel, args.tmodel, args.pretrained,
        enable_fusion=args.enable_fusion, fusion_type=args.fusion_type,
        seed=args.seed,
    )
    tokenize = load_default_tokenizer(cfg.context_length)
    epochs_fn, total_samples = build_data(args, model_cfg, tokenize)

    steps_per_epoch = (
        (total_samples or (args.train_num_samples or 1024)) // args.batch_size
    )
    optimizer = make_optimizer(
        lr=args.lr, beta1=args.beta1, beta2=args.beta2, eps=args.eps,
        weight_decay=args.wd, warmup=args.warmup,
        total_steps=max(steps_per_epoch * args.epochs, 1),
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

    metric_logger = MetricLogger(log_base, tuple(filter(None, args.report_to.split(","))))
    rng = jax.random.PRNGKey(args.seed)
    batch_time, data_time = AverageMeter(), AverageMeter()
    global_step = int(np.asarray(state["step"]))
    top_k = {i: (-np.inf) for i in range(args.save_top_performance)} if args.save_top_performance else {}

    with mesh:
        for epoch in range(start_epoch, args.epochs):
            end = time.time()
            for batch in epochs_fn(epoch):
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
            if (epoch + 1) % args.save_frequency == 0:
                checkpoints.save_checkpoint(ckpt_dir, jax.device_get(state), epoch, name)
            if args.save_most_recent:
                checkpoints.save_most_recent(ckpt_dir, jax.device_get(state))

    return {"state": state, "ckpt_dir": ckpt_dir, "steps": global_step}


if __name__ == "__main__":
    main()
