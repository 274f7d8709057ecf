#!/bin/bash
# Multi-host contrastive pretraining launch — the TPU equivalent of the
# reference's 3-node x 8-GPU SLURM script
# (`CLAP/experiment_scripts/train-htsat-roberta.sh`).
#
# One process PER HOST (not per chip): jax.distributed.initialize() inside
# the trainer wires all hosts into one device view; the data mesh spans all
# chips. No NCCL/EFA env needed — collectives ride ICI/DCN via XLA.
#
# SLURM: sbatch --nodes=4 --ntasks-per-node=1 this_script.sh
# GCE TPU pods: run on every worker via gcloud compute tpus tpu-vm ssh --worker=all.

#SBATCH --comment=clap
#SBATCH --nodes=4
#SBATCH --ntasks-per-node=1
#SBATCH --exclusive
#SBATCH --job-name=audio-residual-tpu

export MASTER_ADDR=${MASTER_ADDR:-$(scontrol show hostnames "$SLURM_JOB_NODELIST" 2>/dev/null | head -n1)}
export MASTER_PORT=${MASTER_PORT:-12802}

srun --comment clap python -m audio_residual_tpu.training.main \
    --save-frequency 5 \
    --save-top-performance 3 \
    --save-most-recent \
    --dataset-type webdataset \
    --datasetpath /mnt/audio_clip/webdataset_tar \
    --datasetnames audioset Clotho audiocaps \
    --batch-size 96 \
    --lr 1e-4 \
    --wd 0.0 \
    --epochs 45 \
    --warmup 3200 \
    --amodel HTSAT-tiny \
    --tmodel roberta \
    --precision bf16 \
    --report-to tensorboard \
    --logs /mnt/logs
