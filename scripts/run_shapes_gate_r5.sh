#!/usr/bin/env bash
# Re-gate the shapes-64 DiT candidates WITH the budget axis (VERDICT r4
# item 4): the r4 run gated dit_p8_d256_l8 only at 12k steps — the one
# budget — in the round whose headline lesson was that verdicts flip with
# training budget.
#
# PER-CONFIG invocations (r5 lesson): a monolithic
# `--configs unet64,p8,p4` run at 24k trains ~6 experts for ~100+ min
# (fp32 DiT training after the bf16-detonation fix) and writes ALL of its
# JSONs only at the end — one watchdog kill loses everything. Instead the
# baseline runs alone (its report JSON is a valid `--baseline` file), then
# each candidate gates against that JSON, so every completed config is a
# committed artifact no later kill can revoke. p8 goes first: it is the
# only candidate whose SERVING roofline clears the >300 img/s bar by a
# margin (64 tokens ≈ 63 GFLOP/img ≈ 1.1k img/s at measured MFU; p4's 256
# tokens price at ~280 img/s — it is quality insurance, not the headline).
#
#   bash scripts/run_shapes_gate_r5.sh
set -uo pipefail
cd "$(dirname "$0")/.."

OUT="${OUT:-outputs/quality_gate_shapes_r5}"
CANDS="${CANDS:-dit_p8_d256_l8 dit_p4_d256_l8}"

for STEPS in 24000 48000; do
  BASE="$OUT/quality_shapes_unet64_s${STEPS}.json"
  if [ ! -f "$BASE" ]; then
    bash scripts/tpu_retry.sh 3000 3 \
        python scripts/quality_gate_shapes.py --configs unet64 \
        --baseline unet64 --train_steps "$STEPS" --out "$OUT" || exit 1
  fi
  ALLPASS=yes
  for CAND in $CANDS; do
    J="$OUT/quality_shapes_${CAND}_s${STEPS}.json"
    if [ -f "$J" ]; then
      V=$(python -c "import json; print(json.load(open('$J')).get('verdict'))")
      echo "# $CAND @ $STEPS: already gated ($V)"
    else
      # rc=1 just means FAIL verdict — the JSON still lands; only a
      # timeout/stall (no JSON) is a real failure worth aborting on.
      bash scripts/tpu_retry.sh 5400 2 \
          python scripts/quality_gate_shapes.py --configs "$CAND" \
          --baseline "$BASE" --train_steps "$STEPS" --out "$OUT"
      [ -f "$J" ] || { echo "# $CAND @ $STEPS: no report — aborting"; exit 1; }
      V=$(python -c "import json; print(json.load(open('$J')).get('verdict'))")
    fi
    [ "$V" = "PASS" ] || ALLPASS=no
  done
  # stop escalating budgets once every candidate PASSes
  [ "$ALLPASS" = "yes" ] && break
done
echo "shapes-64 r5 gate complete"
