#!/usr/bin/env bash
# Classifier-guidance holdout evals (--op cg): equal-weight composition
# steered by a leakage-free VP-noised probe (trained on the same
# holdout-filtered data the experts see). Sweeps the guidance scale; run at
# the same reference-equivalent budget as the flagship evals for README
# comparability.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

echo "=== cg holdout eval: shapes ==="
python scripts/eval_composition.py --train.steps=$STEPS \
    --samples_per_combo 64 --n_steps 100 --op avg,cg \
    --weight_grid "[[1,1],[3,1],[10,1],[30,1]]" --probe_steps 2000 \
    --out outputs/cg_eval

echo "=== cg holdout eval: colored-MNIST ==="
python scripts/eval_composition.py --dataset colored_mnist \
    --train.steps=$STEPS --samples_per_combo 64 --n_steps 100 \
    --op avg,cg --weight_grid "[[1,1],[3,1],[10,1],[30,1]]" \
    --holdout "[[7,2]]" --probe_steps 2000 --out outputs/cg_eval

echo "=== min-SNR-trained experts A/B (same ops, snr_gamma=5, own out dir) ==="
python scripts/eval_composition.py --train.steps=$STEPS \
    --train.snr_gamma=5 --samples_per_combo 64 --n_steps 100 \
    --op avg,cg --weight_grid "[[1,1],[10,1]]" --probe_steps 2000 \
    --out outputs/cg_eval_snr

echo "cg eval complete"
