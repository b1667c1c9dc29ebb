#!/usr/bin/env bash
# Orchestration pipeline (parity: /root/reference/mnist/run_composition.sh):
# train two digit-subset experts, compose them, render the grid.
set -euo pipefail
cd "$(dirname "$0")/.."

SANITY="${SANITY:-}"
FLAGS=""
if [ -n "$SANITY" ]; then FLAGS="--sanity"; fi

python scripts/train_image.py --preset mnist_image --classes "[0,1,2,3,4]" \
    --name expert_04 $FLAGS
python scripts/train_image.py --preset mnist_image --classes "[5,6,7,8,9]" \
    --name expert_59 $FLAGS
python scripts/compose_scores.py --preset mnist_image \
    --experts '["expert_04","expert_59"]' --sampler ddim
echo "composition pipeline complete — see outputs/mnist_image/run_0/results/"
