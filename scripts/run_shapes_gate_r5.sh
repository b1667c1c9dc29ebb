#!/usr/bin/env bash
# Re-gate the shapes-64 DiT candidates WITH the budget axis (VERDICT r4
# item 4): the r4 run gated dit_p8_d256_l8 only at 12k steps — the one
# budget — in the round whose headline lesson was that verdicts flip with
# training budget. This runs 24k first (then 48k for FAILs, mirroring
# scripts/frontier_sweep.py's escalation), and adds the p4 candidate
# (256 tokens — the regime where the DiT already measured MFU 0.458,
# bench.py dit_eval_flagship_mfu).
#
#   bash scripts/tpu_retry.sh 7200 3 bash scripts/run_shapes_gate_r5.sh
set -uo pipefail
cd "$(dirname "$0")/.."

OUT="${OUT:-outputs/quality_gate_shapes_r5}"
CANDS="dit_p8_d256_l8 dit_p4_d256_l8"

for STEPS in 24000 48000; do
  TODO=""
  for CAND in $CANDS; do
    J="$OUT/quality_shapes_${CAND}_s${STEPS}.json"
    if [ -f "$J" ]; then
      echo "# $CAND @ $STEPS: already gated ($(python -c "
import json; print(json.load(open('$J')).get('verdict'))"))"
    else
      TODO="$TODO,$CAND"
    fi
  done
  TODO="${TODO#,}"
  [ -z "$TODO" ] && continue
  # tpu_retry: two watchdog kills on 2026-08-21 were genuine tunnel
  # stalls mid-training — relaunch up to 3x per budget. (The r4/r5
  # "shape expert never trains" failure was separate and real: a
  # deterministic bf16 divergence at ~10-12k steps, fixed by the gate's
  # default --clip_norm 1.0; repro in
  # artifacts/quality_gate_shapes_r5/p8_divergence_repro.log.)
  bash scripts/tpu_retry.sh 6000 3 \
      python scripts/quality_gate_shapes.py --configs "unet64,$TODO" \
      --baseline unet64 --train_steps "$STEPS" --out "$OUT"
  # stop escalating budgets once every candidate PASSes
  ALLPASS=$(python - "$OUT" "$STEPS" <<'EOF'
import glob, json, sys
out, steps = sys.argv[1], sys.argv[2]
vs = []
for p in glob.glob(f"{out}/quality_shapes_dit_*_s{steps}.json"):
    vs.append(json.load(open(p)).get("verdict"))
print("yes" if vs and all(v == "PASS" for v in vs) else "no")
EOF
)
  [ "$ALLPASS" = "yes" ] && break
done
echo "shapes-64 r5 gate complete"
