#!/usr/bin/env bash
# VERDICT r2 #1: quality gate for FLOP-efficient headline-bench flagships.
#
# The headline bench (bench.py) is defined on the WORKLOAD (MNIST 28x28,
# 50-step DDIM, 3 composed experts), not on the reference's base-64 M1
# architecture; the reference itself ships a base-32 UNet for MNIST-sized
# images (src/composing_colored_mnist.py:98-136). This runs the gate
# protocol (scripts/quality_gate_flagship.py) on the base-64 parity config
# and each cheaper candidate at the full reference-equivalent budget, then
# the headline bench program per candidate width. Promotion rule: a
# candidate becomes the headline config only if its solo in-subset
# accuracy/confidence and composed-sample stats match base-64's (the
# committed JSONs + grids under artifacts/quality_gate/ are the evidence).
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"
OUT="${OUT:-outputs/quality_gate}"
CONFIGS="${CONFIGS:-unet64,unet48,unet32,unet24,dit_p7_d256_l6}"

python scripts/quality_gate_flagship.py --configs "$CONFIGS" \
    --train_steps "$STEPS" --out "$OUT"

echo "=== headline bench program per candidate width ==="
for W in 64 48 32 24; do
  python bench.py --base_dim "$W" --batch_sizes 256,384,512,1024 --iters 3 \
      --skip_extras 2>"$OUT/bench_unet$W.stderr" \
      | tee "$OUT/bench_unet$W.json" || true
done

echo "quality gate runs complete; evidence in $OUT"
