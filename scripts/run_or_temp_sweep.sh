#!/usr/bin/env bash
# VERDICT r3 item 5: characterize (or fix) SUPERDIFF OR's measured collapse.
#
# At temp=1 the r3 mixture run measured balance error 0.383 (frac from
# expert A = 0.117): log_q sums <dx, s> over a 1000-step trajectory of a
# 2352-dim image, so its scale grows with d and T and the OR softmax is
# winner-take-most BY CONSTRUCTION. This sweeps the already-plumbed
# temperature (equivalently: per-dim / per-dim-per-step normalization of
# log_q) on ONE set of trained experts — deciding whether the collapse is
# a normalization artifact (some temp gives balance error < 0.1 with
# digits from both halves) or scale-intrinsic.
#
#   bash scripts/tpu_retry.sh 7200 3 bash scripts/run_or_temp_sweep.sh
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"

python scripts/eval_superdiff.py --protocol mixture --train_steps "$STEPS" \
    --temp_sweep "1.0,0.1,0.01,1/d,1/dT" \
    --out outputs/superdiff_or_temp

echo "OR temperature sweep complete"
