#!/usr/bin/env python
"""Spatial-mask layout composition (parity:
/root/reference/src/composing_colored_digit_to_simulate_overlaying.py —
per-region expert scores with occlusion resolution, last mask on top)."""

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from _common import add_runtime_flags, apply_runtime_flags, build_model, build_schedule, init_params
from composable_diffusion_models_tpu import experts, samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import save_grid


def circular_mask(h, w, center=None, radius=None):
    if center is None:
        center = (w // 2, h // 2)
    if radius is None:
        radius = min(center[0], center[1], w - center[0], h - center[1])
    yy, xx = np.ogrid[:h, :w]
    dist = np.sqrt((xx - center[0]) ** 2 + (yy - center[1]) ** 2)
    return jnp.asarray((dist <= radius).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="colored_mnist_guided")
    ap.add_argument("--experts", default='["expert_a","expert_b"]')
    ap.add_argument("--radius", type=int, default=None)
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    key = jax.random.PRNGKey(args.seed)
    sde = build_schedule(cfg)
    model = build_model(cfg)
    mgr = CheckpointManager(args.out, cfg.name)

    names = json.loads(args.experts)
    like = {"params": init_params(cfg, model, key), "step": 0}
    params_list = [mgr.load(n, like=like)["params"] for n in names]
    stack = experts.ExpertStack(model.apply, params_list)

    size = cfg.data.img_size
    # background expert everywhere; foreground expert in a centered circle
    masks = jnp.stack([jnp.ones((size, size)),
                       circular_mask(size, size, radius=args.radius)])

    shape = (cfg.sample.batch_size, size, size, cfg.model.in_channels)
    x_init = jax.random.normal(key, shape)
    # conditional models: label 0 per slot per expert by default
    n_slots = len(cfg.model.num_classes)
    label_args = [experts.per_expert(
        jnp.zeros((len(names), cfg.sample.batch_size), jnp.int32))
        for _ in range(n_slots)]
    out = samplers.layout(
        lambda x, ti: stack(x, ti.astype(jnp.float32), *label_args),
        sde, key, x_init, masks)
    path = save_grid(out, f"{mgr.results_dir}/layout_composed.png")
    print(f"layout-composed samples saved to {path}")


if __name__ == "__main__":
    main()
