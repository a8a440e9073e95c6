#!/bin/bash
# Evolutionary search, sr_tiny_666 space (1.58G MACs)
# One process per TPU host; devices form the data-parallel mesh.
# Per-host batch = per-chip batch x local chips (reference used 128/GPU x 8).
set -e
IMAGENET_PATH="${IMAGENET_PATH:-/datasets/imagenet}"
MODEL_PATH="${MODEL_PATH:-models/super_net/no_distill/tiny/checkpoints/epoch@119}"
python -m vit_search_tpu.cli.evo_search \
    --data-path "$IMAGENET_PATH" \
    --val-bs 256 \
    --num_workers 16 \
    --model-path "$MODEL_PATH" \
    --model 'flexible_vit_sr_patch14_224' \
    --network-def '((0, 256), (1, (256, 4, 64), (256, 768), 1), (1, (256, 4, 64), (256, 768), 1), (1, (256, 4, 64), (256, 768), 1), (1, (256, 4, 64), (256, 768), 1), (1, (256, 4, 64), (256, 768), 1), (1, (256, 4, 64), (256, 768), 1), (3, 256, 512), (1, (512, 8, 64), (512, 1536), 1), (1, (512, 8, 64), (512, 1536), 1), (1, (512, 8, 64), (512, 1536), 1), (1, (512, 8, 64), (512, 1536), 1), (1, (512, 8, 64), (512, 1536), 1), (1, (512, 8, 64), (512, 1536), 1), (3, 512, 1024), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (1, (1024, 12, 64), (1024, 3072), 1), (2, 1024, 1000))' \
    --search-space 'sr_tiny_666' \
    --constraint-value 1580000000 \
    --search-iter 20 \
    --parent-size 75 \
    --init-popu-size 500 \
    --mutate-size 75 \
    --output_dir models/evolutionary_search/tiny_666
