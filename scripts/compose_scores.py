#!/usr/bin/env python
"""Compose K image experts with a weighted eps blend — the north-star
benchmark path (parity: /root/reference/mnist/compose_scores.py, rebuilt as
one vmapped expert forward inside a jitted scan).
"""

import argparse
import json

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_model, build_schedule, init_params
from composable_diffusion_models_tpu import compose, experts, samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import save_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_image")
    ap.add_argument("--experts", default='["expert_a","expert_b"]',
                    help="JSON list of checkpoint names")
    ap.add_argument("--weights", default=None, help="JSON list of weights")
    ap.add_argument("--sampler", default="em", choices=["em", "ddim", "dpmpp"])
    ap.add_argument("--corrector_steps", type=int, default=0,
                    help="Langevin corrector steps per DDIM level — the "
                         "Du-et-al-2023 fix for composed (non-gradient) "
                         "score fields; ddim sampler only")
    ap.add_argument("--corrector_snr", type=float, default=0.16)
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

    names = json.loads(args.experts)
    like = {"params": init_params(cfg, model, key), "step": 0}
    params_list = [mgr.load(n, like=like)["params"] for n in names]
    stack = experts.ExpertStack(model.apply, params_list)
    weights = jnp.asarray(json.loads(args.weights) if args.weights
                          else [1.0] * len(names))

    eps_fn = lambda x, t: compose.weighted(stack(x, t), weights)
    shape = (cfg.sample.batch_size, cfg.data.img_size, cfg.data.img_size,
             cfg.model.in_channels)
    x_init = jax.random.normal(key, shape)

    if args.sampler == "dpmpp":
        out = samplers.dpm_solver_pp_2m(eps_fn, schedule, x_init,
                                        cfg.sample.n_steps)
    elif args.sampler == "ddim":
        out = samplers.ddim(eps_fn, schedule, x_init, cfg.sample.n_steps,
                            key=(jax.random.fold_in(key, 1)
                                 if args.corrector_steps else None),
                            corrector_steps=args.corrector_steps,
                            corrector_snr=args.corrector_snr)
    else:
        out = samplers.euler_maruyama(eps_fn, schedule, key, x_init,
                                      cfg.sample.n_steps, cfg.sample.xi)

    path = save_grid(out, f"{mgr.results_dir}/composed_{'_'.join(names)}.png")
    print(f"composed samples saved to {path}")


if __name__ == "__main__":
    main()
