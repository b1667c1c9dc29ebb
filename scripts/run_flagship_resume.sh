#!/usr/bin/env bash
# Resume of run_flagship.sh after the TPU tunnel died at workload 2
# (workload 1's MNIST experts + composition completed and are in
# outputs/mnist_image/run_0). Identical budgets/args to run_flagship.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"
BS="${BS:-256}"
EMA="${EMA:-0.999}"
T="--train.steps=$STEPS --train.batch_size=$BS --train.ema_decay=$EMA"

echo "=== workload 2: MNIST PCA latent-2D experts ==="
python scripts/fit_pca.py --preset mnist_latent2d
python scripts/train_latent_2d.py --preset mnist_latent2d --classes "[0,1]" \
    --name latent_01 --train.steps=8000
python scripts/train_latent_2d.py --preset mnist_latent2d --classes "[8,9]" \
    --name latent_89 --train.steps=8000
python scripts/sample_latent.py --preset mnist_latent2d \
    --experts '["latent_01"]' --sample.batch_size=256
python scripts/visualize_composition_latent.py --preset mnist_latent2d \
    --experts '["latent_01","latent_89"]'

echo "=== workload 3: shapes per-class latent experts + image DDIM ==="
python scripts/latent_shape_experts.py --train.steps=8000
python scripts/train_image.py --preset shapes_ddim --conditional \
    --name shape_expert_gray $T --model.in_channels=1 --data.grayscale=true
python scripts/train_image.py --preset shapes_ddim --conditional \
    --label_slots "[1]" --name color_expert $T
python scripts/compose_images_ddim.py --preset shapes_ddim \
    --shape_expert shape_expert_gray --color_expert color_expert --bs 4

echo "=== workload 4: conditional shape x color + holdout eval ==="
python scripts/eval_composition.py --train.steps=$STEPS \
    --samples_per_combo 64 --n_steps 100 --op avg,ito \
    --weight_grid "[[1,1],[1,1.5],[1.5,1]]" --probe_steps 2000
python scripts/eval_composition.py --train.steps=$STEPS \
    --samples_per_combo 64 --n_steps 100 --op avg,cfg --uncond_prob 0.1 \
    --weight_grid "[[1,1],[2,2],[3,3]]" --probe_steps 2000
python scripts/eval_composition.py --dataset colored_mnist \
    --train.steps=$STEPS --samples_per_combo 64 --n_steps 100 \
    --op avg,cfg --uncond_prob 0.1 --weight_grid "[[1,1],[2,2]]" \
    --holdout "[[7,2]]" --probe_steps 2000

echo "=== workload 5: cross-attention guided UNet + CFG + 3-factor bbox ==="
python scripts/train_image.py --preset ito_cross_attention --conditional \
    --name guided $T
python scripts/compose_cfg.py --preset ito_cross_attention --name guided \
    --digit 3 --color 1 --guidance "[2.0,2.0]"
python scripts/compose_bbox.py --train.steps=$STEPS --bs 4

echo "flagship resume complete"
