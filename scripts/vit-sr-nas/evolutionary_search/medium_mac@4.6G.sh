#!/bin/bash
# Evolutionary search, ViT-ResNAS-Medium budget (4.6G MACs)
# One process per TPU host; devices form the data-parallel mesh.
# Per-host batch = per-chip batch x local chips (reference used 128/GPU x 8).
set -e
IMAGENET_PATH="${IMAGENET_PATH:-/datasets/imagenet}"
MODEL_PATH="${MODEL_PATH:-models/super_net/small/checkpoints/epoch@119}"
python -m vit_search_tpu.cli.evo_search \
    --data-path "$IMAGENET_PATH" \
    --val-bs 256 \
    --num_workers 16 \
    --model-path "$MODEL_PATH" \
    --model 'flexible_vit_sr_patch14_224_patch_output' \
    --network-def '((4, 320), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (1, (320, 8, 32), (320, 960), 1), (3, 320, 640), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (1, (640, 16, 48), (640, 1920), 1), (3, 640, 1280), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (1, (1280, 16, 64), (1280, 3840), 1), (2, 1280, 1000))' \
    --search-space 'sr_small_mh' \
    --constraint-value 4600000000 \
    --search-iter 20 \
    --parent-size 75 \
    --init-popu-size 500 \
    --mutate-size 75 \
    --output_dir models/evolutionary_search/medium_mac@4.6G
