#!/usr/bin/env python
"""Sample from a trained image expert (parity: /root/reference/mnist/sample_image.py
— whose E-M step is fixed here, see samplers.euler_maruyama docstring).
"""

import argparse

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_model, build_schedule, init_params
from composable_diffusion_models_tpu import samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import save_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_image")
    ap.add_argument("--name", default="expert")
    ap.add_argument("--sampler", default=None,
                    choices=[None, "em", "ddim", "ode", "dpmpp", "picard"])
    ap.add_argument("--eta", type=float, default=0.0,
                    help="stochastic-DDIM noise level (0 = deterministic)")
    ap.add_argument("--corrector_steps", type=int, default=0,
                    help="Langevin corrector steps per DDIM level "
                         "(predictor-corrector, Song et al. 2021 alg. 4)")
    ap.add_argument("--corrector_snr", type=float, default=0.16)
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    if args.sampler:
        cfg.sample.sampler = args.sampler
    key = jax.random.PRNGKey(args.seed)
    schedule = build_schedule(cfg)
    model = build_model(cfg)
    mgr = CheckpointManager(args.out, cfg.name)
    like = {"params": init_params(cfg, model, key), "step": 0}
    params = mgr.load(args.name, like=like)["params"]

    shape = (cfg.sample.batch_size, cfg.data.img_size, cfg.data.img_size,
             cfg.model.in_channels)
    x_init = jax.random.normal(key, shape)
    eps_fn = lambda x, t: model.apply(params, x, t)

    if (cfg.train.predict != "eps"
            and cfg.sample.sampler not in (None, "", "ddim")):
        raise SystemExit(f"predict='{cfg.train.predict}' models sample via "
                         "ddim only (the flag is threaded through "
                         "samplers.ddim; em/ode/picard/dpmpp consume eps "
                         "closures)")
    if cfg.sample.sampler == "em":
        out = samplers.euler_maruyama(eps_fn, schedule, key, x_init,
                                      cfg.sample.n_steps, cfg.sample.xi)
    elif cfg.sample.sampler == "ode":
        score_fn = lambda x, t: -eps_fn(x, t) / schedule.sigma(t)
        out = samplers.prob_flow_ode(score_fn, schedule, x_init,
                                     cfg.sample.n_steps)
    elif cfg.sample.sampler == "picard":
        # parallel-in-time Picard solve (samplers.parallel_prob_flow):
        # latency path for small batches — n_iters sweeps instead of
        # n_steps sequential forwards
        score_fn = lambda x, t: -eps_fn(x, t) / schedule.sigma(t).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        out, resid = samplers.parallel_prob_flow(
            score_fn, schedule, x_init, cfg.sample.n_steps, n_iters=15)
        print(f"picard residual tail: {float(resid[-1]):.2e}")
    elif cfg.sample.sampler == "dpmpp":
        out = samplers.dpm_solver_pp_2m(eps_fn, schedule, x_init,
                                        cfg.sample.n_steps)
    else:
        out = samplers.ddim(eps_fn, schedule, x_init, cfg.sample.n_steps,
                            eta=args.eta,
                            key=(jax.random.fold_in(key, 1)
                                 if args.eta or args.corrector_steps else None),
                            predict=cfg.train.predict,
                            corrector_steps=args.corrector_steps,
                            corrector_snr=args.corrector_snr)

    path = save_grid(out, f"{mgr.results_dir}/{args.name}_samples.png")
    print(f"samples saved to {path}")


if __name__ == "__main__":
    main()
