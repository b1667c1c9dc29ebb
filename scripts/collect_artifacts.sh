#!/usr/bin/env bash
# Copy the judge-facing sample grids + eval reports from outputs/ (gitignored:
# it also holds orbax checkpoints) into the tracked artifacts/ tree.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p artifacts
for d in outputs/*/run_0/results outputs/*/*/run_0/results; do
  [ -d "$d" ] || continue
  preset=$(echo "$d" | cut -d/ -f2)
  [ "$preset" = verify_scratch ] && continue
  mkdir -p "artifacts/$preset"
  find "$d" -maxdepth 1 \( -name '*.png' -o -name '*.json' \) \
    -exec cp {} "artifacts/$preset/" \;
done
# flat evidence dirs (gate JSONs/grids land directly under outputs/<name>/)
for name in quality_gate_r4 quality_gate_shapes_r4 superdiff_or_temp; do
  [ -d "outputs/$name" ] || continue
  mkdir -p "artifacts/$name"
  find "outputs/$name" -maxdepth 1 \( -name '*.png' -o -name '*.json' \) \
    -exec cp {} "artifacts/$name/" \;
done
echo "collected: $(find artifacts -type f | wc -l) files"
