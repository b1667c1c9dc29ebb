#!/usr/bin/env python
"""Train one image-space diffusion expert (parity entry point:
/root/reference/mnist/train_image.py and shapes/train_image.py).

Examples:
  python scripts/train_image.py --preset mnist_image --classes "[0,1,2,3,4]" \
      --name expert_04 --sanity
  python scripts/train_image.py --preset shapes_ddim --name shape_expert
"""

import argparse
import json

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_dataset, build_model, build_schedule, init_params
from composable_diffusion_models_tpu import train
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.utils import get_config, save_yaml
from composable_diffusion_models_tpu.utils.viz import plot_loss, save_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_image")
    ap.add_argument("--name", default="expert")
    ap.add_argument("--classes", default=None,
                    help="JSON list of class ids to train on, e.g. [0,1]")
    ap.add_argument("--conditional", action="store_true",
                    help="pass dataset labels to the model")
    ap.add_argument("--label_slots", default=None,
                    help="JSON indices into the dataset label tuple, e.g. "
                         "[1] to condition the color expert on color labels")
    ap.add_argument("--sanity", action="store_true")
    ap.add_argument("--resumable", action="store_true",
                    help="checkpoint {params, opt_state, step} every chunk "
                         "and resume from the newest step checkpoint "
                         "(preemption recovery; bitwise-identical restart)")
    ap.add_argument("--out", default="outputs")
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    if args.classes:
        cfg.data.classes = tuple(json.loads(args.classes))
    cfg.train.sanity = cfg.train.sanity or args.sanity
    cfg.apply_sanity()

    key = jax.random.PRNGKey(cfg.train.seed)
    schedule = build_schedule(cfg)
    model = build_model(cfg)
    images, labels = build_dataset(cfg, jax.random.fold_in(key, 1))
    if args.conditional:
        if args.label_slots:
            slots = json.loads(args.label_slots)
            train_labels = tuple(labels[s] for s in slots)
        else:
            train_labels = labels[: len(cfg.model.num_classes)]
    else:
        train_labels = ()

    params = init_params(cfg, model, jax.random.fold_in(key, 2))
    mgr = CheckpointManager(args.out, cfg.name)
    train_kw = dict(
        labels=train_labels, steps=cfg.train.steps,
        batch_size=cfg.train.batch_size, lr=cfg.train.lr,
        predict=cfg.train.predict,
        snr_gamma=cfg.train.snr_gamma or None,
        uncond_prob=cfg.train.uncond_prob,
        null_labels=tuple(cfg.model.num_classes) if cfg.train.uncond_prob else None,
        steps_per_scan=min(100, cfg.train.steps))
    if cfg.train.ema_decay > 0:
        train_kw["ema_decay"] = cfg.train.ema_decay
    if args.resumable:
        params, losses = train.train_expert_resumable(
            jax.random.fold_in(key, 3), model.apply, params, schedule, images,
            mgr, args.name, **train_kw)
    else:
        params, losses = train.train_expert(
            jax.random.fold_in(key, 3), model.apply, params, schedule, images,
            **train_kw)
    path = mgr.save(args.name, {"params": params, "step": cfg.train.steps})
    save_yaml(cfg, f"{mgr.logs_dir}/{args.name}_config.yaml")
    if losses.shape[0]:  # empty when a resumable run was already complete
        plot_loss(losses, f"{mgr.results_dir}/{args.name}_loss.png")

    # one-step denoise smoke grid (the reference's validation hook)
    if cfg.schedule.family == "vp" and not cfg.model.num_classes:
        grid = train.one_step_denoise_val(
            model.apply, params, schedule, key,
            (16, cfg.data.img_size, cfg.data.img_size, cfg.model.in_channels))
        save_grid(grid, f"{mgr.results_dir}/{args.name}_onestep.png", nrow=4)

    final = f"{float(losses[-1]):.4f}" if losses.shape[0] else "resumed-complete"
    print(f"saved checkpoint: {path}  final_loss={final}")


if __name__ == "__main__":
    main()
