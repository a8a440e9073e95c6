#!/bin/bash
# Supernet training, sr_tiny_mh space, conv patch embedding
# One process per TPU host; devices form the data-parallel mesh.
# Per-host batch = per-chip batch x local chips (reference used 128/GPU x 8).
set -e
IMAGENET_PATH="${IMAGENET_PATH:-/datasets/imagenet}"
python -m vit_search_tpu.cli.train \
    --model flexible_vit_sr_patch14_224_patch_output_supernet \
    --batch-size 1024 \
    --no-model-ema \
    --data-path "$IMAGENET_PATH" \
    --epochs 120 \
    --num_workers 16 \
    --output_dir models/super_net/no_distill/tiny_conv-patch \
    --val-bs 192 \
    --network-def '((4, 256), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (3, 256, 512), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (3, 512, 1024), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (2, 1024, 1000))' \
    --search-space 'sr_tiny_mh' \
    --example-per-arch 64 \
    --use-holdout \
    --no-repeated-aug \
    --use-patch-mixup \
    --drop-path 0.2
