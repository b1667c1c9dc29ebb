#!/usr/bin/env bash
# Reference-budget runs of the 5 BASELINE.json workloads + the quantitative
# compositional-generalization eval (VERDICT r1 next-2). Budgets: ~3M images
# per expert (12k steps x bs 256 ~= the reference's 200-epoch recipes); each
# expert is ~1-2 min of device time at the measured training throughput.
# All artifacts land in outputs/<preset>/run_0/results/.
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${STEPS:-12000}"
BS="${BS:-256}"
EMA="${EMA:-0.999}"
# resume support: START=3 bash scripts/run_flagship.sh skips workloads 1-2
START="${START:-1}"
case "$START" in
  ''|*[!0-9]*)
    # a non-integer START would make every [ -le ] guard fail silently and
    # the script would "complete" having run nothing
    echo "START must be an integer 1-5, got '$START'" >&2; exit 2;;
esac
T="--train.steps=$STEPS --train.batch_size=$BS --train.ema_decay=$EMA"

[ "$START" -le 1 ] && {
echo "=== workload 1: MNIST image-space experts + composition ==="
python scripts/train_image.py --preset mnist_image --classes "[0,1,2,3,4]" \
    --name expert_04 $T
python scripts/train_image.py --preset mnist_image --classes "[5,6,7,8,9]" \
    --name expert_59 $T
python scripts/sample_image.py --preset mnist_image --name expert_04 \
    --sampler ddim --sample.n_steps=100 --sample.batch_size=64
python scripts/compose_scores.py --preset mnist_image \
    --experts '["expert_04","expert_59"]' --sampler ddim \
    --sample.n_steps=100 --sample.batch_size=64
}

[ "$START" -le 2 ] && {
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
}

[ "$START" -le 3 ] && {
echo "=== workload 3: shapes per-class latent experts + image DDIM ==="
python scripts/latent_shape_experts.py --train.steps=8000
python scripts/train_image.py --preset shapes_ddim --conditional \
    --name shape_expert_gray $T --model.in_channels=1 --data.grayscale=true
python scripts/train_image.py --preset shapes_ddim --conditional \
    --label_slots "[1]" --name color_expert $T
python scripts/compose_images_ddim.py --preset shapes_ddim \
    --shape_expert shape_expert_gray --color_expert color_expert --bs 4
}

[ "$START" -le 4 ] && {
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
}

[ "$START" -le 5 ] && {
echo "=== workload 5: cross-attention guided UNet + CFG + 3-factor bbox ==="
python scripts/train_image.py --preset ito_cross_attention --conditional \
    --name guided $T
python scripts/compose_cfg.py --preset ito_cross_attention --name guided \
    --digit 3 --color 1 --guidance "[2.0,2.0]"
python scripts/compose_bbox.py --train.steps=$STEPS --bs 4
}

echo "flagship runs complete"
