#!/usr/bin/env python
"""Train a 2D PCA-latent MLP expert (parity: /root/reference/mnist/train_latent_2d.py).

Encodes the dataset with a fitted PCA, then trains the ScoreMLP on latents —
the whole dataset fits in VMEM, so training is a fused scan."""

import argparse
import json
import os

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_dataset, build_model
from composable_diffusion_models_tpu import train
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.ops.pca import load_pca
from composable_diffusion_models_tpu.schedules import VPSchedule
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import plot_loss, scatter2d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_latent2d")
    ap.add_argument("--pca", default=None,
                    help="PCA prefix (default: <out>/pca)")
    ap.add_argument("--classes", default=None)
    ap.add_argument("--name", default="latent_expert")
    ap.add_argument("--out", default="outputs")
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    if args.pca is None:
        args.pca = os.path.join(args.out, "pca")
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    if args.classes:
        cfg.data.classes = tuple(json.loads(args.classes))
    key = jax.random.PRNGKey(cfg.train.seed)
    schedule = VPSchedule(kind=cfg.schedule.kind)
    model = build_model(cfg)
    images, (labels, *_) = build_dataset(cfg, key)

    pca = load_pca(args.pca)
    z = pca.encode(images)
    mgr = CheckpointManager(args.out, cfg.name)
    scatter2d(z, f"{mgr.results_dir}/{args.name}_latents.png", labels=labels,
              title="PCA latents", lim=float(jnp.abs(z).max()) * 1.1)

    params = model.init(key, jnp.ones((1, 1)), jnp.zeros((1, 2)))
    params, losses = train.train_expert(
        jax.random.fold_in(key, 1), model.apply, params, schedule, z,
        steps=cfg.train.steps, batch_size=cfg.train.batch_size,
        lr=cfg.train.lr, time_first=True,
        steps_per_scan=min(200, cfg.train.steps))

    path = mgr.save(args.name, {"params": params, "step": cfg.train.steps})
    plot_loss(losses, f"{mgr.results_dir}/{args.name}_loss.png")
    print(f"saved {path}  final_loss={float(losses[-1]):.4f}")


if __name__ == "__main__":
    main()
