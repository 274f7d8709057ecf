"""Retrieval eval CLI — ``python -m audio_residual_tpu.evaluate.eval_retrieval_main``.

Reference: `evaluate/eval_retrieval_main.py:19-257` (checkpoint-dir sweep) and
`evaluate/eval_retrieval.py:17-192` (single run); both recover amodel/tmodel
from the training run's ``params.txt`` — supported here via ``--params-txt``.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os

from audio_residual_tpu.data.shards import ShardedAudioText, resolve_tar_paths
from audio_residual_tpu.evaluate.retrieval import evaluate_retrieval, select_top_metric
from audio_residual_tpu.module import CLAPModule
from audio_residual_tpu.training.logger import setup_logging


def read_params_txt(path: str) -> dict:
    """Recover run hyperparameters from a params.txt dump (`eval_retrieval_main.py`)."""
    out = {}
    with open(path) as f:
        for line in f:
            if ": " in line:
                k, v = line.split(": ", 1)
                out[k.strip()] = v.strip()
    return out


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt-dir", default=None, help="sweep every epoch_* checkpoint")
    p.add_argument("--pretrained", default=None, help="single checkpoint")
    p.add_argument("--params-txt", default=None)
    p.add_argument("--amodel", default="HTSAT-tiny")
    p.add_argument("--tmodel", default="roberta")
    p.add_argument("--datasetpath", required=True)
    p.add_argument("--datasetnames", nargs="+", default=["Clotho"])
    p.add_argument("--split", default="test")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--metric", default="text_to_audio_mAP@10")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    setup_logging()
    if args.params_txt:
        run_params = read_params_txt(args.params_txt)
        args.amodel = run_params.get("amodel", args.amodel)
        args.tmodel = run_params.get("tmodel", args.tmodel)

    module = CLAPModule(amodel=args.amodel, tmodel=args.tmodel)
    paths, _ = resolve_tar_paths(args.datasetpath, args.datasetnames, args.split)
    pipe = ShardedAudioText(
        tar_paths=paths, tokenize=module.tokenize, batch_size=args.batch_size,
        max_len=module.cfg.audio.clip_samples, audio_cfg=module.model_cfg["audio_cfg"],
    )

    ckpts = [args.pretrained] if args.pretrained else sorted(
        glob.glob(os.path.join(args.ckpt_dir or ".", "epoch_*"))
    )
    history = []
    for ckpt in ckpts:
        if ckpt:
            module.load_ckpt(ckpt)
        batches = ((b["waveform"], b["text"]) for b in pipe.epoch(0))
        m = evaluate_retrieval(module, batches)
        m["ckpt"] = ckpt
        history.append(m)
        logging.info("%s: %s", ckpt, m)
    best = select_top_metric(history, args.metric)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"history": history, "best": best}, f, indent=2, default=str)
    return {"history": history, "best": best}


if __name__ == "__main__":
    main()
