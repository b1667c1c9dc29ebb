#!/usr/bin/env bash
# unet48 near-boundary verdict stability (VERDICT r4 item 6 "done"
# criterion): with the r5 noise-escalating gate (4x samples + second
# sampling seed whenever a criterion lands within noise of its threshold),
# unet48's verdicts at 12k/24k/48k train steps must be REPRODUCIBLE across
# two full training/sampling seeds — whatever they turn out to be. The r4
# record (PASS/FAIL/PASS across budgets, decided by ~1 probe flip in 256
# samples) is the failure mode being retired.
#
# One gate invocation per (seed, budget) cell, separate out dirs per seed
# (same filename per budget otherwise); completed cells skip on relaunch.
#
#   bash scripts/tpu_retry.sh 7200 3 bash scripts/run_unet48_stability.sh
set -uo pipefail
cd "$(dirname "$0")/.."

BASE="artifacts/quality_gate_r4/quality_unet64.json"

for SEED in 0 1; do
  OUT="outputs/unet48_stability_seed$SEED"
  for STEPS in 12000 24000 48000; do
    SFX=""; [ "$STEPS" != 12000 ] && SFX="_s$STEPS"
    J="$OUT/quality_unet48$SFX.json"
    if [ -f "$J" ]; then
      echo "# seed $SEED @ $STEPS: done ($(python -c "
import json; print(json.load(open('$J')).get('verdict'))"))"
      continue
    fi
    python scripts/quality_gate_flagship.py --configs unet48 \
        --train_steps "$STEPS" --seed "$SEED" --baseline "$BASE" \
        --out "$OUT" || true
  done
done

echo "=== unet48 stability matrix ==="
python - <<'EOF'
import glob, json
for f in sorted(glob.glob("outputs/unet48_stability_seed*/quality_unet48*.json")):
    d = json.load(open(f))
    esc = "escalated" if "escalation" in d else "single-pass"
    print(f, d.get("verdict"), f"in_union={d['composed']['in_set_frac']:.4f}",
          f"n={d.get('n_samples')}", esc)
EOF
