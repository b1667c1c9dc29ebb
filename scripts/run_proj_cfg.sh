#!/usr/bin/env bash
# Follow-up to run_proj_protocol.sh: proj + proj_cfg (CFG inside each
# expert, then projection substitution) on shared trained experts, with
# per-dataset output dirs (the first batch's two evals overwrote each
# other's grids in a shared run_0).
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== proj+proj_cfg: shapes holdout eval ==="
python scripts/eval_composition.py --train.steps=$STEPS \
    --samples_per_combo 64 --n_steps 100 --op proj,proj_cfg \
    --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --weight_grid "[[1,1],[2,2],[3,3]]" --probe_steps 2000 \
    --out outputs/proj2_shapes

echo "=== proj+proj_cfg: colored-MNIST holdout eval ==="
python scripts/eval_composition.py --dataset colored_mnist \
    --train.steps=$STEPS --samples_per_combo 64 --n_steps 100 \
    --op proj,proj_cfg --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --weight_grid "[[1,1],[2,2],[3,3]]" --holdout "[[7,2]]" \
    --probe_steps 2000 --out outputs/proj2_cm

echo "proj_cfg runs complete"
