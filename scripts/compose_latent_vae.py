#!/usr/bin/env python
"""Compose VAE-latent diffusion experts and decode (parity:
/root/reference/src/4.3 best_of_both_worlds{,_2,_4}.py — weighted eps blend or
CFG in the 10-d VAE latent space, then decoder)."""

import argparse
import json

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_dataset  # noqa: F401 (path setup)
from composable_diffusion_models_tpu import compose, samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.models import BetaVAE
from composable_diffusion_models_tpu.models.mlp import LatentDiffusionMLP
from composable_diffusion_models_tpu.schedules import DDPMSchedule
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import save_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_image")
    ap.add_argument("--name", default="vae")
    ap.add_argument("--digits", default="[3,5]",
                    help="JSON digit conditions to compose")
    ap.add_argument("--mode", default="cfg", choices=["cfg", "weighted"])
    ap.add_argument("--guidance", type=float, default=2.0)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--latent_dim", type=int, default=10)
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    key = jax.random.PRNGKey(args.seed)
    mgr = CheckpointManager(args.out, f"{cfg.name}_vae")

    vae = BetaVAE(img_size=cfg.data.img_size,
                  in_channels=cfg.model.in_channels,
                  latent_dim=args.latent_dim)
    mlp = LatentDiffusionMLP(latent_dim=args.latent_dim, hidden=256, depth=3,
                             num_classes=(10,), null_token=True)
    like = {
        "vae": vae.init(key, jnp.zeros((1, cfg.data.img_size,
                                        cfg.data.img_size,
                                        cfg.model.in_channels)), key),
        "mlp": mlp.init(key, jnp.ones((1,)), jnp.zeros((1, args.latent_dim)),
                        jnp.zeros((1,), jnp.int32)),
        "latent_dim": args.latent_dim,
    }
    state = mgr.load(args.name, like=like)
    vparams, mparams = state["vae"], state["mlp"]

    sde = DDPMSchedule(num_timesteps=300)
    digits = json.loads(args.digits)
    bs = args.bs

    if args.mode == "cfg":
        cond_labels = [(jnp.asarray(d),) for d in digits]
        eps_fn = samplers.make_cfg_eps_fn(
            lambda z, t, lab: mlp.apply(mparams, t, z, lab),
            cond_labels, (jnp.asarray(10),),
            jnp.full((len(digits),), args.guidance))

        def eps_stack_like(z, ti):
            return eps_fn(z, ti.astype(jnp.float32))

        z = samplers.ddpm_ancestral(eps_stack_like, sde, key,
                                    jax.random.normal(key, (bs, args.latent_dim)),
                                    clip=None)
    else:
        labels = [jnp.full((bs,), d, jnp.int32) for d in digits]

        def eps_comb(z, ti):
            stack = jnp.stack([mlp.apply(mparams, ti.astype(jnp.float32), z, lab)
                               for lab in labels])
            return compose.weighted(stack, jnp.ones((len(digits),)))

        z = samplers.ddpm_ancestral(eps_comb, sde, key,
                                    jax.random.normal(key, (bs, args.latent_dim)),
                                    clip=None)

    imgs = vae.apply(vparams, z, method=BetaVAE.decode)
    path = save_grid(imgs, f"{mgr.results_dir}/vae_composed_{args.mode}.png",
                     nrow=4)
    print(f"VAE-latent composed samples saved to {path}")


if __name__ == "__main__":
    main()
