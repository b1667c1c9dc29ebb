#!/usr/bin/env bash
# VERDICT r2 #3 + #7: put SUPERDIFF OR/AND on the measured leaderboard and
# archive the CIFAR class-split composition.
#
# Protocols (scripts/eval_superdiff.py, scripts/compose_cifar.py) mirror
# the reference's own flagship experiments:
#   mixture  — /root/reference/src/composing_colored_mnist.py:237-310
#   factored — .../composing_conditional_diffusion_on_shape_and_color_6_1.py:330-429
#   cifar    — src/composing_colored_mnist.py:321-329 (procedural stand-in;
#              no network egress here)
# Budgets match every other leaderboard row: 12k steps x bs 256 per expert.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"
START="${START:-1}"

[ "$START" -le 1 ] && {
echo "=== SUPERDIFF mixture (colored-MNIST digit halves, OR target 50/50) ==="
python scripts/eval_superdiff.py --protocol mixture --train_steps "$STEPS" \
    --out outputs/superdiff_eval/mixture
}

[ "$START" -le 2 ] && {
echo "=== SUPERDIFF factored AND/OR (shapes, holdout (2,2)) ==="
python scripts/eval_superdiff.py --protocol factored --dataset shapes \
    --train_steps "$STEPS" --out outputs/superdiff_eval/factored_shapes
}

[ "$START" -le 3 ] && {
echo "=== SUPERDIFF factored AND/OR (colored-MNIST, holdout (7,2)) ==="
python scripts/eval_superdiff.py --protocol factored --dataset colored_mnist \
    --train_steps "$STEPS" --out outputs/superdiff_eval/factored_cm
}

[ "$START" -le 4 ] && {
echo "=== CIFAR class-split composition (procedural stand-in) ==="
python scripts/compose_cifar.py --train_steps "$STEPS" \
    --out outputs/cifar_split
}

echo "superdiff eval runs complete"
