#!/usr/bin/env bash
# Follow-up to run_flagship.sh: the reference's OWN held-out-generalization
# recipe — a color-blind (grayscale) factor-0 expert composed with an RGB
# color expert (shapes/compose_images_ddim.py protocol; see
# scripts/eval_composition.py --factor0_grayscale). Run at the same
# reference-equivalent budget as the flagship evals.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== gray-protocol holdout eval: shapes ==="
python scripts/eval_composition.py --train.steps=$STEPS \
    --samples_per_combo 64 --n_steps 100 --op avg,ito --factor0_grayscale \
    --weight_grid "[[1,1],[1,1.5],[1,2]]" --probe_steps 2000 \
    --out outputs/gray_protocol

echo "=== gray-protocol + CFG holdout eval: shapes (both levers) ==="
python scripts/eval_composition.py --train.steps=$STEPS \
    --samples_per_combo 64 --n_steps 100 --op cfg --uncond_prob 0.1 \
    --factor0_grayscale --weight_grid "[[2,2],[3,3],[5,5]]" \
    --probe_steps 2000 --out outputs/gray_cfg

echo "=== gray-protocol holdout eval: colored-MNIST ==="
python scripts/eval_composition.py --dataset colored_mnist \
    --train.steps=$STEPS --samples_per_combo 64 --n_steps 100 \
    --op avg,cfg --uncond_prob 0.1 --factor0_grayscale \
    --weight_grid "[[1,1],[2,2],[3,3]]" --holdout "[[7,2]]" --probe_steps 2000 \
    --out outputs/gray_protocol

echo "gray-protocol runs complete"
