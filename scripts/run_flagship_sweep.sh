#!/usr/bin/env bash
# VERDICT r3 item 3: sweep the ACTUAL flagship recipe across holdout cells
# at the full reference-equivalent budget.
#
# The r3 flagship compositional numbers — shapes 0.828 held-out joint
# (proj_cg w=(2,1)) and colored-MNIST 0.453 (proj_cg w=(2,1)) / 0.406
# (proj w=(2,3)) — were each ONE holdout cell (artifacts/dit_proj_eq_*),
# while the r3 cell sweep used a different recipe (ITU-601 luma expert at
# 5k steps) whose error bars do not transfer. This driver runs the QUOTED
# recipe — DiT backbone, EQUAL-WEIGHT unit-norm gray factor-0 expert,
# proj + proj_cg, 12k steps/expert, 2 probes — over 5 shapes cells and the
# 3 colored-MNIST cells, producing mean [min-max] for the flagship rows.
#
# Wrap in scripts/tpu_retry.sh when the tunnel is flaky:
#   bash scripts/tpu_retry.sh 10800 3 bash scripts/run_flagship_sweep.sh
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== flagship recipe sweep: shapes, 5 cells ==="
python scripts/eval_composition.py --model.kind=dit --train.steps="$STEPS" \
    --train.snr_gamma=5 --samples_per_combo 64 --n_steps 100 \
    --op proj,proj_cg --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --gray_proj equal --weight_grid "[[2,1],[2,3]]" --probe_steps 2000 \
    --probe_seeds 2 --holdout_sweep "[[2,2],[0,2],[1,1],[2,0],[0,1]]" \
    --out outputs/flagship_sweep_shapes

echo "=== flagship recipe sweep: colored-MNIST, 3 cells ==="
python scripts/eval_composition.py --model.kind=dit --dataset colored_mnist \
    --train.steps="$STEPS" --train.snr_gamma=0 --samples_per_combo 64 \
    --n_steps 100 --op proj,proj_cg --uncond_prob 0.1 --factor0_grayscale \
    --gray_norm --gray_proj equal --weight_grid "[[2,1],[2,3]]" \
    --probe_steps 2000 --probe_seeds 2 \
    --holdout_sweep "[[7,2],[3,0],[5,1]]" \
    --out outputs/flagship_sweep_cm

echo "flagship sweep complete"
