#!/bin/bash
# Higher-resolution finetune of ViT-ResNAS-Medium at 280px
# One process per TPU host; devices form the data-parallel mesh.
# Per-host batch = per-chip batch x local chips (reference used 128/GPU x 8).
set -e
IMAGENET_PATH="${IMAGENET_PATH:-/datasets/imagenet}"
python -m vit_search_tpu.cli.train \
    --model flexible_vit_sr_patch14_280_patch_output \
    --batch-size 256 \
    --data-path "$IMAGENET_PATH" \
    --epochs 30 \
    --num_workers 16 \
    --output_dir models/finetune/medium_img-size@280 \
    --val-bs 64 \
    --network-def '((4, 240), (1, (240, 7, 32), (240, 960), 1), (1, (240, 6, 32), (240, 960), 1), (1, (240, 7, 32), (240, 800), 1), (1, (240, 8, 32), (240, 960), 1), (1, (240, 7, 32), (240, 880), 1), (1, (240, 8, 32), (240, 880), 1), (1, (240, 6, 32), (240, 800), 1), (3, 240, 640), (1, (640, 10, 48), (640, 1120), 1), (1, (640, 14, 48), (640, 1760), 1), (1, (640, 14, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1760), 1), (1, (640, 14, 48), (640, 1440), 1), (1, (640, 16, 48), (640, 1760), 1), (1, (640, 16, 48), (640, 1920), 1), (3, 640, 880), (1, (880, 16, 64), (880, 3200), 1), (1, (880, 10, 64), (880, 3840), 1), (1, (880, 16, 64), (880, 3840), 1), (1, (880, 12, 64), (880, 3200), 1), (1, (880, 16, 64), (880, 3520), 1), (1, (880, 14, 64), (880, 3520), 1), (2, 880, 1000))' \
    --no-repeated-aug \
    --use-patch-mixup \
    --finetune models/searched_net/medium_mac@4.6G/checkpoints/best_ema \
    --drop-path 0.75 \
    --input-size 280 \
    --mixup-patch-len 5 \
    --lr 5e-6 \
    --min-lr 5e-6 \
    --weight-decay 1e-8
