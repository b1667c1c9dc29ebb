#!/usr/bin/env bash
# Round-4 tail measurement queue: run after the flagship sweep frees the
# chip. Sequential (single chip; parallel launches starve each other's
# init probes on the 1-core host — measured r4).
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== OR temperature sweep (VERDICT r3 item 5) ==="
bash scripts/tpu_retry.sh 7200 4 bash scripts/run_or_temp_sweep.sh

echo "=== shapes-64 quality gate (VERDICT r3 item 6) ==="
bash scripts/tpu_retry.sh 7200 4 python scripts/quality_gate_shapes.py \
    --configs unet64,dit_p8_d256_l8 --baseline unet64 \
    --out outputs/quality_gate_shapes_r4 || true

echo "=== tail queue complete ==="
