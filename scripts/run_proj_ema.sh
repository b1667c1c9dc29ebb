#!/usr/bin/env bash
# EMA variant of the projection-substitution protocol: run_proj_cfg.sh
# trained without EMA (preset default ema_decay=0), while the flagship cfg
# evals used --train.ema_decay=0.999 — this run pairs the proj/proj_cfg
# operators with the EMA recipe so the two lever families are compared on
# equal training footing.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== proj+proj_cfg EMA: shapes holdout eval ==="
python scripts/eval_composition.py --train.steps=$STEPS \
    --train.ema_decay=0.999 \
    --samples_per_combo 64 --n_steps 100 --op proj,proj_cfg \
    --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --weight_grid "[[1,1],[2,2]]" --probe_steps 2000 \
    --out outputs/proj_ema_shapes

echo "=== proj EMA: colored-MNIST holdout eval ==="
python scripts/eval_composition.py --dataset colored_mnist \
    --train.steps=$STEPS --train.ema_decay=0.999 \
    --samples_per_combo 64 --n_steps 100 \
    --op proj --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --weight_grid "[[1.5,1],[2,1],[2.5,1]]" --holdout "[[7,2]]" \
    --probe_steps 2000 --out outputs/proj_ema_cm

echo "proj EMA runs complete"
