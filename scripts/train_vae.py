#!/usr/bin/env python
"""Train the beta-VAE codec + latent diffusion experts (parity:
/root/reference/src/4.3 best_of_both_worlds.py — VAE, cached-mu latent
dataset, latent MLP diffusion)."""

import argparse
import json

import jax
import jax.numpy as jnp
import optax

from _common import add_runtime_flags, apply_runtime_flags, build_dataset
from composable_diffusion_models_tpu import train
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.models import BetaVAE, vae_loss
from composable_diffusion_models_tpu.models.mlp import LatentDiffusionMLP
from composable_diffusion_models_tpu.schedules import DDPMSchedule
from composable_diffusion_models_tpu.utils import get_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_image")
    ap.add_argument("--latent_dim", type=int, default=10)
    ap.add_argument("--beta", type=float, default=1.0)
    ap.add_argument("--vae_steps", type=int, default=2000)
    ap.add_argument("--diff_steps", type=int, default=2000)
    ap.add_argument("--name", default="vae")
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--sanity", action="store_true")
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    if args.sanity:
        args.vae_steps, args.diff_steps = 30, 30
        cfg.data.n = 256
    key = jax.random.PRNGKey(cfg.train.seed)
    images, (labels, *_) = build_dataset(cfg, key)
    images01 = (images + 1.0) / 2.0  # VAE trains on [0, 1] with BCE

    vae = BetaVAE(img_size=cfg.data.img_size,
                  in_channels=cfg.model.in_channels,
                  latent_dim=args.latent_dim)
    vparams = vae.init(key, images01[:1], key)
    tx = optax.adam(1e-3)
    opt_state = tx.init(vparams)
    n = images01.shape[0]

    @jax.jit
    def vae_step(params, opt_state, k):
        kb, kr = jax.random.split(k)
        idx = jax.random.randint(kb, (128,), 0, n)
        batch = jnp.take(images01, idx, axis=0)

        def loss_fn(p):
            recon, mu, lv = vae.apply(p, batch, kr)
            return vae_loss(recon, batch, mu, lv, args.beta)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    for i in range(args.vae_steps):
        vparams, opt_state, loss = vae_step(vparams, opt_state,
                                            jax.random.fold_in(key, i))
    print(f"VAE final loss: {float(loss):.2f}")

    # cache mu encodings (the LatentDataset of the reference)
    mu, _ = vae.apply(vparams, images01, method=BetaVAE.encode)

    # latent diffusion expert on cached latents (discrete schedule)
    sde = DDPMSchedule(num_timesteps=300)
    mlp = LatentDiffusionMLP(latent_dim=args.latent_dim, hidden=256, depth=3,
                             num_classes=(10,), null_token=True)
    mparams = mlp.init(key, jnp.ones((1,)), jnp.zeros((1, args.latent_dim)),
                       jnp.zeros((1,), jnp.int32))
    mparams, losses = train.train_expert(
        jax.random.fold_in(key, 1), mlp.apply, mparams, sde, mu,
        labels=(labels,), steps=args.diff_steps, batch_size=256, lr=1e-3,
        uncond_prob=0.1, null_labels=(10,), time_first=True,
        steps_per_scan=min(100, args.diff_steps))

    mgr = CheckpointManager(args.out, f"{cfg.name}_vae")
    path = mgr.save(args.name, {"vae": vparams, "mlp": mparams,
                                "latent_dim": args.latent_dim})
    print(f"saved VAE+latent-diffusion: {path}  "
          f"diff_loss={float(losses[-1]):.4f}")


if __name__ == "__main__":
    main()
