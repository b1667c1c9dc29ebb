#!/usr/bin/env python
"""Sample from latent-2D experts and decode through PCA (parity:
/root/reference/mnist/sample_latent.py — E-M in 2D, then z W + mu decode)."""

import argparse
import os
import json

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_model
from composable_diffusion_models_tpu import compose, samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.ops.pca import load_pca
from composable_diffusion_models_tpu.schedules import VPSchedule
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import save_grid, scatter2d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_latent2d")
    ap.add_argument("--pca", default=None,
                    help="PCA prefix (default: <out>/pca)")
    ap.add_argument("--experts", default='["latent_expert"]')
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    if args.pca is None:
        args.pca = os.path.join(args.out, "pca")
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    key = jax.random.PRNGKey(args.seed)
    schedule = VPSchedule(kind=cfg.schedule.kind)
    model = build_model(cfg)
    mgr = CheckpointManager(args.out, cfg.name)

    names = json.loads(args.experts)
    like = {"params": model.init(key, jnp.ones((1, 1)), jnp.zeros((1, 2))),
            "step": 0}
    params_list = [mgr.load(n, like=like)["params"] for n in names]
    weights = jnp.asarray(json.loads(args.weights) if args.weights
                          else [1.0] * len(names))

    def eps_fn(x, t):
        # MLP convention: net(t, x) trained on (eps_hat - eps)^2
        stack = jnp.stack([model.apply(p, jnp.full((x.shape[0],), t), x)
                           for p in params_list])
        return compose.weighted(stack, weights)

    z_init = jax.random.normal(key, (cfg.sample.batch_size, 2))
    z = samplers.euler_maruyama(eps_fn, schedule, key, z_init,
                                cfg.sample.n_steps, cfg.sample.xi)
    scatter2d(z, f"{mgr.results_dir}/latent_samples.png",
              title="latent samples")

    pca = load_pca(args.pca)
    imgs = pca.decode(z, (cfg.data.img_size, cfg.data.img_size, 1))
    path = save_grid(imgs, f"{mgr.results_dir}/latent_decoded.png")
    print(f"decoded samples saved to {path}")


if __name__ == "__main__":
    main()
