#!/usr/bin/env bash
# DiT x proj_cg holdout eval: the measured-best backbone (models/dit.py,
# 0.91/0.688 on shapes under cg w=3) crossed with the measured-best UNet
# operator recipe (projection substitution + classifier guidance on min-SNR
# experts, 0.66/0.625 — artifacts/proj_cg_snr_shapes/). Round-1 left this
# cell of the (backbone x operator) grid unmeasured; this script fills it.
# Same reference-equivalent budget and leakage-free probe protocol as
# run_proj_cg.sh / the DiT cg runs (artifacts/dit_compose_{shapes,cm}/).
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== DiT proj+proj_cg: shapes holdout eval ==="
python scripts/eval_composition.py --model.kind=dit --train.steps=$STEPS \
    --train.snr_gamma=5 --samples_per_combo 64 --n_steps 100 \
    --op proj,proj_cg --uncond_prob 0.1 --factor0_grayscale --gray_norm \
    --weight_grid "[[1,1],[1,3],[2,3]]" --probe_steps 2000 \
    --out outputs/dit_proj_shapes

echo "=== DiT proj+proj_cg: colored-MNIST holdout eval ==="
python scripts/eval_composition.py --model.kind=dit --dataset colored_mnist \
    --train.steps=$STEPS --train.snr_gamma=0 --samples_per_combo 64 \
    --n_steps 100 --op proj,proj_cg --uncond_prob 0.1 --factor0_grayscale \
    --gray_norm --weight_grid "[[2,1],[2,3],[1,3]]" --holdout "[[7,2]]" \
    --probe_steps 2000 --out outputs/dit_proj_cm

echo "DiT proj_cg runs complete"
