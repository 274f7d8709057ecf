"""Experiment driver 1: analyze CLAP attention representations.

Script equivalent of the reference's `1_Analyze_CLAP_Attention.ipynb`:
download ESC-50, build CLAP, stream a fold through the encoder collecting
per-(layer, head) attention maps, fit PCA per head ON DEVICE, save the
reference-format CSV, and report intrinsic-dimensionality findings.

Run: ``python examples/1_analyze_clap_attention.py --ckpt 630k-audioset-best.pt``
"""

from __future__ import annotations

import argparse

import jax

from audio_residual_tpu.data.datasets import get_fold_loaders
from audio_residual_tpu.data.featurize import featurize_batch
from audio_residual_tpu.models import clap as clap_mod
from audio_residual_tpu.module import CLAPModule
from audio_residual_tpu.ops.quantize import quantize_roundtrip
from audio_residual_tpu.residual import analyze


def main(argv=None):
    from audio_residual_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--dataset", default="ESC50")
    p.add_argument("--root", default=".")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--save-dir", default="pca_results")
    args = p.parse_args(argv)

    module = CLAPModule()
    if args.ckpt:
        module.load_ckpt(args.ckpt)
    cfg = module.cfg

    @jax.jit
    def encode_with_taps(wav):
        w = quantize_roundtrip(wav)
        batch = featurize_batch(w, cfg.audio.clip_samples)
        return clap_mod.encode_audio(module.params, batch, cfg, taps=("attention",))

    _, val_batches = get_fold_loaders(args.dataset, args.root, args.batch_size)[args.fold]

    results = analyze.run_pca(
        lambda wav: encode_with_taps(wav),
        (wav for wav, _ in val_batches()),
        num_layers=cfg.audio.num_layers,
        num_heads=cfg.audio.num_heads,
        max_batches=args.max_batches,
        window=cfg.audio.window_size,
    )
    csv_path = analyze.save_pca_results_on_file(args.save_dir, args.dataset, args.fold, results)
    print("saved:", csv_path)
    for (layer, head), r in sorted(results.items()):
        idim = analyze.intrinsic_dim(r["explained_variance_ratio"], threshold=0.90)
        pr = analyze.participation_ratio(r["explained_variance"])
        print(f"layer {layer} head {head}: intrinsic_dim={idim} participation_ratio={pr:.1f}")


if __name__ == "__main__":
    main()
