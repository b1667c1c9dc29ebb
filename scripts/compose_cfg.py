#!/usr/bin/env python
"""Classifier-free-guidance composition with a dual-conditioned model
(parity: /root/reference/src/compositional_diffusion_with_cross_attention.py:266-315
and ..._5.py:291-341 — the 4-way condition fan-out runs as ONE batched
forward)."""

import argparse
import json

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_model, build_schedule, init_params
from composable_diffusion_models_tpu import samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import save_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="colored_mnist_guided")
    ap.add_argument("--name", default="guided")
    ap.add_argument("--digit", type=int, default=3)
    ap.add_argument("--color", type=int, default=6)
    ap.add_argument("--guidance", default="[2.0,2.0]",
                    help="JSON per-condition guidance weights")
    ap.add_argument("--sampler", default="ddim", choices=["ddim", "em"])
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    key = jax.random.PRNGKey(args.seed)
    schedule = build_schedule(cfg)
    model = build_model(cfg)
    mgr = CheckpointManager(args.out, cfg.name)
    like = {"params": init_params(cfg, model, key), "step": 0}
    params = mgr.load(args.name, like=like)["params"]

    n1, n2 = cfg.model.num_classes  # null token = vocab size
    # condition slots: (digit-only, color-only); uncond = both nulls
    cond_labels = [(jnp.asarray(args.digit), jnp.asarray(n2)),
                   (jnp.asarray(n1), jnp.asarray(args.color))]
    null_labels = (jnp.asarray(n1), jnp.asarray(n2))
    weights = jnp.asarray(json.loads(args.guidance))

    eps_fn = samplers.make_cfg_eps_fn(
        lambda x, t, *labs: model.apply(params, x, t, *labs),
        cond_labels, null_labels, weights)

    shape = (cfg.sample.batch_size, cfg.data.img_size, cfg.data.img_size,
             cfg.model.in_channels)
    x_init = jax.random.normal(key, shape)
    if cfg.schedule.family == "vp":
        if args.sampler == "em":
            out = samplers.euler_maruyama(eps_fn, schedule, key, x_init,
                                          cfg.sample.n_steps)
        else:
            out = samplers.ddim(eps_fn, schedule, x_init, cfg.sample.n_steps)
    else:
        out = samplers.ddpm_ancestral(
            lambda x, ti: eps_fn(x, ti.astype(jnp.float32)), schedule, key,
            x_init)
    path = save_grid(out, f"{mgr.results_dir}/cfg_d{args.digit}_c{args.color}.png")
    print(f"CFG-composed samples saved to {path}")


if __name__ == "__main__":
    main()
