#!/usr/bin/env bash
# Canonical-stage training, trousers. TPU-native: no srun/NCCL - one controller
# drives every chip in jax.devices() via pjit data parallelism.
set -e
cd "$(dirname "$0")/../.."
python train_temporal.py \
    --config cfgs/trousers.yaml \
    --GarmentPCA 1 \
    --batch_size 20 \
    --lr 1e-3 \
    --lr_sche \
    --epoch_num 100 \
    --T 10 \
    --npoints 6890 \
    --output_dir ./output/trousers_canonical \
    "$@"
