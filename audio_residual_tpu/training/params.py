"""CLI flag system.

Reference: `training/params.py:13-567` — one argparse parser shared by the
training/eval CLIs (~80 flags across data / optimization / model /
distributed / precision / checkpointing / eval / linear-probe / augmentation /
reporting groups), with model-dependent lr defaults (`:4-10`) backfilled
post-parse (`:561-566`).

Flags that configured torch-specific machinery (NCCL backend selection,
horovod, AMP grad scaler) are kept as accepted-but-informational so existing
launch scripts parse cleanly; their TPU-native behaviour is documented per
flag.
"""

from __future__ import annotations

import argparse

__all__ = ["parse_args", "get_default_params"]


def get_default_params(model_name: str) -> dict:
    """Model-dependent optimizer defaults (`params.py:4-10`)."""
    model_name = model_name.lower()
    if "vit" in model_name:
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6}
    return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8}


def parse_args(args=None) -> argparse.Namespace:
    p = argparse.ArgumentParser("audio-residual-tpu training")

    # data
    p.add_argument("--train-data", type=str, default=None, help="webdataset tar paths / dirs")
    p.add_argument("--val-data", type=str, default=None)
    p.add_argument("--train-num-samples", type=int, default=None)
    p.add_argument("--val-num-samples", type=int, default=None)
    p.add_argument("--dataset-type", choices=["webdataset", "csv", "auto", "toy"], default="auto")
    p.add_argument("--datasetnames", nargs="+", default=None)
    p.add_argument("--datasetinfos", nargs="+", default=None,
                   help="train split names (default train/unbalanced_train/balanced_train)")
    p.add_argument("--full-train-dataset", nargs="+", default=None,
                   help="datasets trained on ALL their splits (dataset_split table)")
    p.add_argument("--exclude-eval-dataset", nargs="+", default=None,
                   help="datasets excluded from the in-training val split")
    p.add_argument("--dataset-proportion", type=float, default=1.0)
    p.add_argument("--datasetpath", type=str, default=None)
    p.add_argument("--remotedata", action="store_true", default=False,
                   help="accepted for compat; this build reads local shards only")
    p.add_argument("--class-label-path", type=str, default=None,
                   help="class-index pickle/json -> args.class_index_dict (data.py:853)")
    p.add_argument("--workers", type=int, default=1,
                   help="accepted for compat; the sharded pipeline is synchronous per host")
    p.add_argument("--prefetch-factor", type=int, default=None,
                   help="background-thread batch prefetch depth "
                        "(utils/misc.prefetch_batches; torch DataLoader's "
                        "knob, reference params.py:553-557)")
    p.add_argument("--train-ipc", type=str, default=None,
                   help="npy of per-class sample indices for the toy "
                        "balanced queue (`data.py:815`); None derives it "
                        "from the h5 targets")
    p.add_argument("--val-ipc", type=str, default=None)
    # open_clip csv legacy: parsed like the reference, whose own dispatcher
    # raises 'Unsupported dataset type: csv' (`data.py:846`) — no csv path
    # shipped there or here
    p.add_argument("--csv-separator", type=str, default="\t")
    p.add_argument("--csv-img-key", type=str, default="filepath")
    p.add_argument("--csv-caption-key", type=str, default="title")

    # model
    p.add_argument("--amodel", type=str, default="HTSAT-tiny")
    p.add_argument("--tmodel", type=str, default="roberta",
                   choices=["transformer", "bert", "roberta", "bart"])
    p.add_argument("--pretrained", type=str, default="")
    p.add_argument("--pretrained-audio", type=str, default="")
    p.add_argument("--pretrained-text", type=str, default="")
    p.add_argument("--freeze-text", action="store_true", default=False)
    p.add_argument("--freeze-text-after", type=int, default=-1)
    p.add_argument("--enable-fusion", action="store_true", default=False)
    p.add_argument("--fusion-type", type=str, default="None",
                   choices=["None", "daf_1d", "aff_1d", "iaff_1d", "daf_2d", "aff_2d", "iaff_2d", "channel_map"])
    p.add_argument("--force-quick-gelu", action="store_true", default=False,
                   help="QuickGELU in the CLIP transformer towers "
                        "(reference factory.py:129-131)")
    # open_clip vision legacy (warned below; functional equivalents noted)
    p.add_argument("--pretrained-image", action="store_true", default=False)
    p.add_argument("--lock-image", action="store_true", default=False)
    p.add_argument("--lock-image-unlocked-groups", type=int, default=0)
    p.add_argument("--lock-image-freeze-bn-stats", action="store_true", default=False)
    # torch-jit legacy: every forward here is XLA-jitted by construction
    p.add_argument("--torchscript", action="store_true", default=False)
    p.add_argument("--trace", action="store_true", default=False)
    p.add_argument("--openai-model-cache-dir", type=str, default="~/.cache/clip",
                   help="download cache for pretrained=openai CLIP weights")

    # optimization
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=32)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--beta1", type=float, default=None)
    p.add_argument("--beta2", type=float, default=None)
    p.add_argument("--eps", type=float, default=None)
    p.add_argument("--wd", type=float, default=0.2)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--warmup", type=int, default=10000)
    p.add_argument("--optimizer", type=str, default="adamw", choices=["adamw", "sgd", "adam"])
    p.add_argument("--skip-scheduler", action="store_true", default=False,
                   help="hold lr at the base value (no warmup/cosine decay); "
                        "the reference parses this and never wires it "
                        "(params.py:233-237) — here it works")
    p.add_argument("--sleep", type=float, default=0,
                   help="sleep n seconds before start (`lp_main.py:296`)")
    p.add_argument("--split-opt", action="store_true", default=False,
                   help="separate optimizer groups for pretrained vs new params")
    for pg in ("pretrained", "new"):
        p.add_argument(f"--lr-{pg}", type=float, default=None)
        p.add_argument(f"--beta1-{pg}", type=float, default=None)
        p.add_argument(f"--beta2-{pg}", type=float, default=None)
        p.add_argument(f"--eps-{pg}", type=float, default=None)
        p.add_argument(f"--wd-{pg}", type=float, default=0.2)
        p.add_argument(f"--momentum-{pg}", type=float, default=0.9)

    # loss
    p.add_argument("--mlp-loss", action="store_true", default=False, help="4-term loss")
    p.add_argument("--local-loss", action="store_true", default=False)
    p.add_argument("--gather-with-grad", action="store_true", default=True,
                   help="always true on TPU: all_gather differentiates")
    p.add_argument("--kappa", type=float, default=0.0, help="weighted-loss kappa")
    p.add_argument("--clap-mlploss", action="store_true", default=False)

    # augmentation
    p.add_argument("--mixup", action="store_true", default=False)
    p.add_argument("--text-augment-selection", type=str, default=None)
    p.add_argument("--data-filling", type=str, default="pad",
                   choices=["repeatpad", "pad", "repeat"])
    p.add_argument("--data-truncating", type=str, default="rand_trunc",
                   choices=["rand_trunc", "fusion"])

    # checkpointing / logging
    p.add_argument("--logs", type=str, default="./logs/")
    p.add_argument("--log-local", action="store_true", default=False)
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--save-frequency", type=int, default=1)
    p.add_argument("--save-top-performance", type=int, default=0)
    p.add_argument("--save-most-recent", action="store_true", default=False)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--copy-codebase", action="store_true", default=False)

    # eval
    p.add_argument("--val-frequency", type=int, default=1)
    # parsed like the reference, which itself never consumes it: the
    # zero_shot_eval call is commented out in evaluate (train.py:274-276)
    p.add_argument("--zeroshot-frequency", type=int, default=2)
    p.add_argument("--parallel-eval", action="store_true", default=False,
                   help="subsumed by GSPMD: eval batches are sharded over "
                        "the same data mesh as training, so every device "
                        "already embeds its shard and similarity matrices "
                        "are computed on globally-sharded features (the "
                        "reference's explicit all_gather, train.py:355-388)")
    p.add_argument("--no-eval", action="store_true", default=False)
    # CLIP-legacy imagenet zero-shot paths: the consuming evaluator is dead
    # code in the reference ("not supported for CLAP", zero_shot.py:13-91);
    # the batched equivalent lives in evaluate/zero_shot_imagenet.py
    p.add_argument("--imagenet-val", type=str, default=None)
    p.add_argument("--imagenet-v2", type=str, default=None)
    p.add_argument("--top-k-checkpoint-select-dataset", type=str, default="all")
    p.add_argument("--top-k-checkpoint-select-metric", type=str, default="_R@10")

    # precision: TPU-native is bf16 matmuls + f32 params; no grad scaler
    p.add_argument("--precision", type=str, default="amp",
                   choices=["amp", "fp16", "fp32", "bf16"],
                   help="amp/bf16 -> bf16 MXU compute; fp16/fp32 -> f32")
    # TPU-native addition (no reference equivalent): jax.checkpoint over the
    # dual-tower forward — backward rematerialises activations, trading
    # FLOPs for HBM so the per-chip batch can grow. Gradients are exact.
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialise tower activations in backward")
    # TPU-native addition (no reference equivalent): FSDP/ZeRO-3-style state
    # sharding over the data mesh (parallel/fsdp.py) — params, grads and Adam
    # moments split across devices, all-gathered just-in-time by GSPMD.
    # Same math as replicated DP; per-chip state memory / mesh size.
    p.add_argument("--fsdp", action="store_true", default=False,
                   help="shard params/grads/optimizer state over the mesh")

    # distributed (informational on TPU; the mesh covers all of these)
    p.add_argument("--dist-url", type=str, default="env://")
    p.add_argument("--dist-backend", type=str, default="nccl",
                   help="ignored: TPU uses XLA collectives over ICI/DCN")
    p.add_argument("--horovod", action="store_true", default=False, help="ignored on TPU")
    p.add_argument("--ddp-static-graph", action="store_true", default=False, help="ignored")
    p.add_argument("--no-set-device-rank", action="store_true", default=False)
    p.add_argument("--use-bn-sync", action="store_true", default=False,
                   help="BN stats are computed over the global batch under pjit")

    # linear probe
    p.add_argument("--lp-mlp", action="store_true", default=False)
    p.add_argument("--lp-freeze", action="store_true", default=False)
    p.add_argument("--lp-act", type=str, default="None")
    p.add_argument("--lp-loss", type=str, default="bce", choices=["bce", "ce", "mse"])
    p.add_argument("--lp-metrics", type=str, default="map,mauc,acc")
    p.add_argument("--lp-lr", type=float, default=1e-4)

    # reporting
    p.add_argument("--report-to", type=str, default="")
    p.add_argument("--wandb-notes", type=str, default="")
    p.add_argument("--wandb-id", type=str, default=None)
    p.add_argument("--debug", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=4242)

    ns = p.parse_args(args)

    # torch-only flags are accepted for script compatibility but must not
    # pass silently — say exactly what each maps to here
    import logging

    if ns.horovod:
        logging.warning(
            "--horovod has no effect: this framework runs one process per "
            "host with XLA collectives over the device mesh (the reference's "
            "Horovod path, distributed.py:70-88, is subsumed by pjit DP)"
        )
    if ns.parallel_eval:
        logging.warning(
            "--parallel-eval is subsumed by GSPMD sharding: eval features "
            "are computed on batch-sharded devices and consumed without an "
            "explicit all_gather (reference train.py:355-388); the flag is "
            "accepted for script compatibility only"
        )
    if ns.dist_backend != "nccl":
        logging.warning(
            "--dist-backend=%s ignored: collectives are XLA over ICI/DCN, "
            "not a torch.distributed backend", ns.dist_backend,
        )
    if ns.ddp_static_graph:
        logging.warning("--ddp-static-graph has no effect: every jit graph is static")
    if ns.local_loss:
        logging.warning(
            "--local-loss: the jitted train step uses the global-batch "
            "formulation, which is numerically identical (losses.py "
            "clip_loss); the shard_map local-loss variant with rank-offset "
            "labels exists for explicit use and is tested equal "
            "(tests/test_distributed.py)"
        )
    if ns.remotedata:
        logging.warning(
            "--remotedata: this build reads local shards only (no S3 "
            "fetch); point --datasetpath at the local mirror"
        )
    if ns.torchscript or ns.trace:
        logging.warning(
            "--torchscript/--trace have no effect: every forward/step here "
            "is XLA-jit-compiled by construction (the reference's "
            "torch.jit.trace_module path, model.py:896-912)"
        )
    if ns.lock_image or ns.lock_image_unlocked_groups or ns.lock_image_freeze_bn_stats:
        logging.warning(
            "--lock-image*: vision-tower locking is expressed as an optax "
            "trainability mask here — see models/vision.vision_freeze_mask "
            "(the reference's lock() path is vision-legacy its CLAP never "
            "builds)"
        )
    if ns.pretrained_image:
        logging.warning(
            "--pretrained-image needs timm imagenet weights (network); "
            "vision towers initialise randomly or from a CLIP checkpoint "
            "via --pretrained"
        )
    if ns.imagenet_val or ns.imagenet_v2:
        logging.warning(
            "--imagenet-val/--imagenet-v2: the consuming evaluator is dead "
            "code in the reference (zero_shot.py 'not supported for CLAP'); "
            "use evaluate/zero_shot_imagenet.py directly if needed"
        )

    # model-dependent defaults backfill (`params.py:561-566`)
    defaults = get_default_params(ns.amodel)
    for k, v in defaults.items():
        if getattr(ns, k) is None:
            setattr(ns, k, v)
    return ns
