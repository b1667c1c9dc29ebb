#!/usr/bin/env bash
# Projection-substitution holdout evals (compose.projected): the
# consistent-noise grayscale composition. Replaces the broadcast-average
# gray protocol, which measures at pure-noise/zero accuracy (see
# compose.projected docstring). Plus the workload-3 composed grid rebuilt
# with a luma_norm-trained shape expert.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== proj protocol: shapes holdout eval ==="
python scripts/eval_composition.py --train.steps=$STEPS \
    --samples_per_combo 64 --n_steps 100 --op proj --uncond_prob 0.1 \
    --factor0_grayscale --gray_norm \
    --weight_grid "[[1,1],[1.5,1],[2,1]]" --probe_steps 2000 \
    --out outputs/proj_protocol

echo "=== proj protocol: colored-MNIST holdout eval ==="
python scripts/eval_composition.py --dataset colored_mnist \
    --train.steps=$STEPS --samples_per_combo 64 --n_steps 100 \
    --op proj --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --weight_grid "[[1,1],[1.5,1],[2,1]]" --holdout "[[7,2]]" \
    --probe_steps 2000 --out outputs/proj_protocol

echo "=== workload 3 grid rebuilt: luma_norm expert + proj compose ==="
python scripts/train_image.py --preset shapes_ddim --conditional \
    --name shape_expert_lnorm --model.in_channels=1 --data.grayscale=true \
    --data.gray_mode=luma_norm --train.steps=$STEPS \
    --train.batch_size=256 --train.ema_decay=0.999
python scripts/compose_images_ddim.py --preset shapes_ddim \
    --shape_expert shape_expert_lnorm --color_expert color_expert \
    --gray_protocol luma_norm --op proj --bs 4 --sample.n_steps=200

echo "proj protocol complete"
