#!/bin/bash
# ViT-Res-Tiny reference net (hand-designed), patch token mixup
# One process per TPU host; devices form the data-parallel mesh.
# Per-host batch = per-chip batch x local chips (reference used 128/GPU x 8).
set -e
IMAGENET_PATH="${IMAGENET_PATH:-/datasets/imagenet}"
python -m vit_search_tpu.cli.train \
    --model flexible_vit_sr_patch14_224_patch_output \
    --batch-size 1024 \
    --data-path "$IMAGENET_PATH" \
    --epochs 300 \
    --num_workers 16 \
    --output_dir models/reference_net/tiny \
    --val-bs 192 \
    --network-def '((4, 192), (1, (192, 3, 64), (192, 768), 1), (1, (192, 3, 64), (192, 768), 1), (1, (192, 3, 64), (192, 768), 1), (1, (192, 3, 64), (192, 768), 1), (3, 192, 384), (1, (384, 6, 64), (384, 1536), 1), (1, (384, 6, 64), (384, 1536), 1), (1, (384, 6, 64), (384, 1536), 1), (1, (384, 6, 64), (384, 1536), 1), (3, 384, 768), (1, (768, 12, 64), (768, 3072), 1), (1, (768, 12, 64), (768, 3072), 1), (1, (768, 12, 64), (768, 3072), 1), (1, (768, 12, 64), (768, 3072), 1), (2, 768, 1000))' \
    --no-repeated-aug \
    --use-patch-mixup \
    --drop-path 0.2
