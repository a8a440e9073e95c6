#!/bin/bash
# Evolutionary search, ViT-ResNAS-Tiny budget (1.7944G MACs)
# One process per TPU host; devices form the data-parallel mesh.
# Per-host batch = per-chip batch x local chips (reference used 128/GPU x 8).
set -e
IMAGENET_PATH="${IMAGENET_PATH:-/datasets/imagenet}"
MODEL_PATH="${MODEL_PATH:-models/super_net/tiny/checkpoints/epoch@119}"
python -m vit_search_tpu.cli.evo_search \
    --data-path "$IMAGENET_PATH" \
    --val-bs 256 \
    --num_workers 16 \
    --model-path "$MODEL_PATH" \
    --model 'flexible_vit_sr_patch14_224_patch_output' \
    --network-def '((4, 256), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (1, (256, 6, 32), (256, 768), 1), (3, 256, 512), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (1, (512, 12, 48), (512, 1536), 1), (3, 512, 1024), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (2, 1024, 1000))' \
    --search-space 'sr_tiny_mh' \
    --constraint-value 1794400000 \
    --search-iter 20 \
    --parent-size 75 \
    --init-popu-size 500 \
    --mutate-size 75 \
    --output_dir models/evolutionary_search/tiny
