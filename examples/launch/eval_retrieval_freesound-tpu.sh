#!/bin/bash
# Freesound retrieval evaluation sweep over a pretraining run's checkpoints —
# TPU equivalent of `CLAP/experiment_scripts/eval_retrieval_freesound.sh`.
python -m audio_residual_tpu.evaluate.eval_retrieval_main \
    --dataset-type webdataset \
    --precision bf16 \
    --batch-size 512 \
    --amodel HTSAT-tiny \
    --tmodel roberta \
    --datasetnames freesound_no_overlap_noesc50 \
    --datasetinfos train \
    --seed 3407 \
    --logs /mnt/clap_logs \
    --data-filling repeatpad \
    --data-truncating rand_trunc \
    --pretrained "/mnt/clap_logs/<run-name>/checkpoints"
