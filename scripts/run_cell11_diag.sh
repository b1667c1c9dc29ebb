#!/usr/bin/env bash
# Diagnose the 0.000 holdout cell (VERDICT r4 item 5).
#
# The r4 flagship-recipe sweep (artifacts/flagship_sweep_shapes) scored
# held-out cell (1,1) — square x green — at 0.000 joint accuracy for EVERY
# operator and weight while neighbors hit 0.95. The archived per-factor
# margins already localize the failure: color accuracy stays 0.80-0.88 but
# SHAPE accuracy collapses to 0.09-0.19 — the composition emits green
# non-squares, i.e. the color expert (which never saw a green square) drags
# the geometry toward the green shapes it knows and the gray shape expert
# at w_shape=2 cannot overpower it.
#
# A/B here (one cell, full 12k budget, same recipe as the sweep):
#   A: shape-expert authority sweep — w_shape 2 -> 4 -> 6 (the sweep only
#      ever tried 2);
#   B: + hue augmentation (--hue_aug 0.25): the gray expert trains on many
#      luma levels so a green square's luma is in-distribution.
# Artifacts: per-combo margins + grids under outputs/cell11_diag{,_hue}.
#
#   bash scripts/tpu_retry.sh 7200 3 bash scripts/run_cell11_diag.sh
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== A: weight sweep, no hue aug ==="
python scripts/eval_composition.py --model.kind=dit --train.steps="$STEPS" \
    --train.snr_gamma=5 --samples_per_combo 64 --n_steps 100 \
    --op proj,proj_cg --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --gray_proj equal --weight_grid "[[2,1],[4,1],[6,1]]" \
    --probe_steps 2000 --holdout "[[1,1]]" \
    --out outputs/cell11_diag

echo "=== B: hue_aug 0.25, weight sweep ==="
python scripts/eval_composition.py --model.kind=dit --train.steps="$STEPS" \
    --train.snr_gamma=5 --samples_per_combo 64 --n_steps 100 \
    --op proj,proj_cg --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --gray_proj equal --weight_grid "[[2,1],[4,1],[6,1]]" --hue_aug 0.25 \
    --probe_steps 2000 --holdout "[[1,1]]" \
    --out outputs/cell11_diag_hue

echo "cell (1,1) diagnosis complete"
