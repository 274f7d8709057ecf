#!/bin/bash
# Zero-shot ESC-50 evaluation — equivalent of
# `CLAP/experiment_scripts/zeroshot_esc50.sh`.
python -m audio_residual_tpu.evaluate.eval_zeroshot_classification \
    --amodel HTSAT-tiny --tmodel roberta \
    --dataset ESC50 --datasetpath . \
    --pretrained "$@" \
    --out esc50_zeroshot_metrics.json
