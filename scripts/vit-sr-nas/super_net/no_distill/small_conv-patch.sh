#!/bin/bash
# Supernet training, sr_small_mh space, conv patch embedding
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
    --output_dir models/super_net/no_distill/small_conv-patch \
    --val-bs 192 \
    --network-def '((4, 320), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (3, 320, 640), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (3, 640, 1280), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (2, 1280, 1000))' \
    --search-space 'sr_small_mh' \
    --example-per-arch 64 \
    --use-holdout \
    --no-repeated-aug \
    --use-patch-mixup \
    --drop-path 0.3
