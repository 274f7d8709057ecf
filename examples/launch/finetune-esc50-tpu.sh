#!/bin/bash
# ESC-50 linear-probe finetune — TPU equivalent of
# `CLAP/experiment_scripts/finetune-esc50.sh` (PANN-14, MLP head, CE loss).

#SBATCH --comment=clap
#SBATCH --nodes=1
#SBATCH --ntasks-per-node=1
#SBATCH --job-name=clap-finetune-esc50

srun --comment clap python -m audio_residual_tpu.training.lp_main \
    --save-frequency 50 \
    --save-top-performance 3 \
    --save-most-recent \
    --dataset-type webdataset \
    --precision bf16 \
    --warmup 0 \
    --batch-size 160 \
    --lr 1e-4 \
    --wd 0.1 \
    --epochs 100 \
    --workers 4 \
    --use-bn-sync \
    --freeze-text \
    --amodel PANN-14 \
    --tmodel roberta \
    --report-to wandb \
    --wandb-notes "finetune-esc50" \
    --datasetnames esc50 \
    --datasetinfos train \
    --seed 3407 \
    --logs /mnt/clap_logs \
    --gather-with-grad \
    --lp-loss ce \
    --lp-metrics acc \
    --lp-lr 1e-4 \
    --lp-mlp \
    --class-label-path class_labels/ESC50_class_labels_indices_space.json \
    --pretrained /mnt/clap_logs/pann-roberta-pretrain/checkpoints \
    --data-filling repeatpad \
    --data-truncating rand_trunc \
    --optimizer adam
