#!/usr/bin/env bash
# Evaluation with a pretrained checkpoint (torch .ckpt or orbax dir).
set -e
cd "$(dirname "$0")/../.."
python train_temporal.py \
    --config cfgs/trousers.yaml \
    --GarmentPCALBS 1 \
    --only_eval 1 \
    --pretrained_model pretrain/trousers.ckpt \
    --batch_size 4 \
    --T 10 \
    --npoints 6890 \
    --output_dir ./output/trousers_eval \
    "$@"
