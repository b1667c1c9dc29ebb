#!/usr/bin/env bash
# Experiment driver (parity: /root/reference/shapes/run_experiments.sh —
# latent | image | all modes) over the shapes + latent pipelines.
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-all}"
SANITY="${SANITY:-}"
FLAGS=""
if [ -n "$SANITY" ]; then FLAGS="--sanity"; fi

run_latent() {
  python scripts/fit_pca.py --preset mnist_latent2d --data.n=4096
  python scripts/train_latent_2d.py --preset mnist_latent2d --data.n=4096
  python scripts/sample_latent.py --preset mnist_latent2d
}

run_image() {
  python scripts/train_image.py --preset shapes_ddim --conditional \
      --name shape_expert --model.in_channels=1 --data.grayscale=true \
      --model.num_classes="[3]" $FLAGS
  python scripts/train_image.py --preset shapes_ddim --conditional \
      --name color_expert --label_slots "[1]" --model.num_classes="[3]" $FLAGS
  python scripts/compose_images_ddim.py --preset shapes_ddim
}

case "$MODE" in
  latent) run_latent ;;
  image)  run_image ;;
  all)    run_latent; run_image ;;
  *) echo "usage: $0 [latent|image|all]"; exit 1 ;;
esac
echo "experiments complete"
