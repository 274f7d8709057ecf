#!/bin/bash
# PANN-14 + RoBERTa contrastive pretraining — TPU equivalent of
# `CLAP/experiment_scripts/train-pann-roberta.sh` (3x8 GPU SLURM + NCCL).
# One process per host; jax.distributed.initialize() inside the trainer
# forms the global device mesh, collectives ride ICI/DCN via XLA.

#SBATCH --comment=clap
#SBATCH --nodes=3
#SBATCH --ntasks-per-node=1
#SBATCH --exclusive
#SBATCH --job-name=clap-pann-roberta

export MASTER_ADDR=${MASTER_ADDR:-$(scontrol show hostnames "$SLURM_JOB_NODELIST" 2>/dev/null | head -n1)}
export MASTER_PORT=${MASTER_PORT:-12802}

srun --comment clap python -m audio_residual_tpu.training.main \
    --save-frequency 5 \
    --save-top-performance 3 \
    --save-most-recent \
    --dataset-type webdataset \
    --precision bf16 \
    --batch-size 96 \
    --lr 1e-4 \
    --wd 0.0 \
    --epochs 45 \
    --workers 6 \
    --use-bn-sync \
    --amodel PANN-14 \
    --tmodel roberta \
    --warmup 500 \
    --report-to wandb \
    --wandb-notes "clap-dataset-1#-pann-roberta" \
    --datasetnames Clotho audiocaps \
    --datasetinfos train unbalanced_train \
    --top-k-checkpoint-select-dataset "Clotho-test" \
    --top-k-checkpoint-select-metric "mAP@10" \
    --logs /mnt/clap_logs \
    --seed 3407 \
    --gather-with-grad \
    --optimizer adam \
    --data-filling repeatpad \
    --data-truncating rand_trunc \
    --pretrained-audio /mnt/audio_pretrained_model/PANN-fullset-map=0.439.ckpt
