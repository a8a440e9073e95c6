#!/bin/bash
# Evaluate trained ViT-ResNAS-Small
# One process per TPU host; devices form the data-parallel mesh.
# Per-host batch = per-chip batch x local chips (reference used 128/GPU x 8).
set -e
IMAGENET_PATH="${IMAGENET_PATH:-/datasets/imagenet}"
python -m vit_search_tpu.cli.train \
    --model flexible_vit_sr_patch14_224_patch_output \
    --batch-size 1024 \
    --data-path "$IMAGENET_PATH" \
    --num_workers 16 \
    --val-bs 192 \
    --network-def '((4, 220), (1, (220, 5, 32), (220, 880), 1), (1, (220, 5, 32), (220, 880), 1), (1, (220, 7, 32), (220, 800), 1), (1, (220, 5, 32), (220, 720), 1), (1, (220, 5, 32), (220, 720), 1), (1, (220, 5, 32), (220, 720), 1), (3, 220, 440), (1, (440, 10, 48), (440, 1760), 1), (1, (440, 10, 48), (440, 1440), 1), (1, (440, 10, 48), (440, 1920), 1), (1, (440, 10, 48), (440, 1600), 1), (1, (440, 12, 48), (440, 1600), 1), (1, (440, 12, 48), (440, 1440), 1), (3, 440, 880), (1, (880, 16, 64), (880, 3200), 1), (1, (880, 12, 64), (880, 3200), 1), (1, (880, 16, 64), (880, 2880), 1), (1, (880, 12, 64), (880, 2240), 1), (1, (880, 14, 64), (880, 2560), 1), (2, 880, 1000))' \
    --eval \
    --resume models/searched_net/small_mac@2.9G/checkpoints/best \
    --no-model-ema
