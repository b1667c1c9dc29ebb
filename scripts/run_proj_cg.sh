#!/usr/bin/env bash
# proj_cg holdout eval: projection substitution (strength w[0]) stacked with
# classifier guidance from the leakage-free holdout-filtered probe (scale
# w[1]) — the two independently-measured-best held-out levers combined, with
# plain proj rows from the same grid as paired baselines (canonical() dedups
# proj to w[0] only, so [[1,1],[1,3],[1,10],[2,3]] yields proj@1 + proj@2).
# Reference-equivalent budget, same as run_proj_cfg.sh / run_cg_eval.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== proj+proj_cg: shapes holdout eval (flagship recipe) ==="
# min-SNR(5) experts + proj_cg w=(1,1) is the measured flagship:
# 0.66 seen / 0.625 held-out joint (artifacts/proj_cg_snr_shapes/).
python scripts/eval_composition.py --train.steps=$STEPS \
    --train.snr_gamma=5 --samples_per_combo 64 --n_steps 100 \
    --op proj,proj_cg --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --weight_grid "[[1,1],[1,3],[2,3]]" --probe_steps 2000 \
    --out outputs/proj_cg_shapes

echo "=== proj+proj_cg: colored-MNIST holdout eval ==="
python scripts/eval_composition.py --dataset colored_mnist \
    --train.steps=$STEPS --samples_per_combo 64 --n_steps 100 \
    --op proj,proj_cg --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --weight_grid "[[2,1],[2,3],[2,10]]" --holdout "[[7,2]]" \
    --probe_steps 2000 --out outputs/proj_cg_cm

echo "proj_cg runs complete"
