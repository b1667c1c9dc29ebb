#!/usr/bin/env python
"""Three-factor (shape, color, bbox) composition — the reference's 3-expert
workload (src/composing_conditional_diffusion_on_shape_and_color_4.py):
white-background shapes with a colored bounding-box outline as a THIRD
generative factor; three single-factor conditional experts trained on the
same holdout-filtered images, composed with the K=3 weighted eps average
(ref :364-412) under ancestral DDPM (T=500).

One command runs the whole pipeline (train 3 experts -> compose grid):
  python scripts/compose_bbox.py --sanity                    # smoke
  python scripts/compose_bbox.py --train.steps=3000          # full
Skip training and reuse checkpoints with --no_train.
"""

import argparse
import functools
import json

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_schedule
from composable_diffusion_models_tpu import compose, data, samplers, train
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.models import UNet
from composable_diffusion_models_tpu.utils import get_config, save_yaml
from composable_diffusion_models_tpu.utils.viz import save_grid

FACTORS = ("shape", "color", "bbox")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="shapes_bbox")
    ap.add_argument("--weights", default="[1.0,1.0,1.0]",
                    help="JSON [w_shape, w_color, w_bbox]")
    ap.add_argument("--bs", type=int, default=4,
                    help="samples per combination in the output grid")
    ap.add_argument("--no_train", action="store_true",
                    help="reuse existing expert checkpoints")
    ap.add_argument("--sanity", action="store_true")
    ap.add_argument("--out", default="outputs")
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    cfg.train.sanity = cfg.train.sanity or args.sanity
    cfg.apply_sanity()
    if args.sanity:
        args.bs = 2
        cfg.sample.n_steps = min(cfg.sample.n_steps, 20)
        cfg.schedule.num_timesteps = min(cfg.schedule.num_timesteps, 20)

    key = jax.random.PRNGKey(cfg.train.seed)
    size = cfg.data.img_size
    schedule = build_schedule(cfg)
    mgr = CheckpointManager(args.out, cfg.name)

    holdout = [tuple(h) for h in cfg.data.holdout]
    imgs, s_lab, c_lab, b_lab = data.make_shapes_bbox_dataset(
        cfg.data.n, size, holdout=holdout)
    factor_labels = (s_lab, c_lab, b_lab)

    model = UNet(in_channels=3, base_dim=cfg.model.base_dim,
                 channel_mults=tuple(cfg.model.channel_mults),
                 num_classes=(3,))
    params = {}
    for i, fac in enumerate(FACTORS):
        name = f"{fac}_expert"
        like = {"params": model.init(
            jax.random.fold_in(key, i), jnp.zeros((1, size, size, 3)),
            jnp.ones((1,)), jnp.zeros((1,), jnp.int32)), "step": 0}
        if args.no_train:
            params[fac] = mgr.load(name, like=like)["params"]
            continue
        print(f"training {fac} expert ...")
        p, losses = train.train_expert(
            jax.random.fold_in(key, 10 + i), model.apply, like["params"],
            schedule, imgs, (factor_labels[i],), steps=cfg.train.steps,
            batch_size=cfg.train.batch_size, lr=cfg.train.lr)
        print(f"  final loss {float(losses[-1]):.4f}")
        mgr.save(name, {"params": p, "step": cfg.train.steps})
        params[fac] = p

    weights = jnp.asarray(json.loads(args.weights), jnp.float32)
    bs = args.bs

    @jax.jit
    def sample_combo(sl, cl, bl, k):
        # labels are TRACED args: one compile covers all 27 combinations
        # (a per-combo closure would retrace the whole sampler each time)
        def eps_fn(x, ti):
            t_in = jnp.full((x.shape[0],), ti, jnp.float32)
            eps = jnp.stack([
                model.apply(params["shape"], x, t_in, sl),
                model.apply(params["color"], x, t_in, cl),
                model.apply(params["bbox"], x, t_in, bl),
            ])
            return compose.weighted(eps, weights)

        x_init = jax.random.normal(k, (bs, size, size, 3))
        return samplers.ddpm_ancestral(eps_fn, schedule, k, x_init)

    grids = []
    combos = [(s, c, b) for s in range(3) for c in range(3) for b in range(3)]
    for n_, (s, c, b) in enumerate(combos):
        out = sample_combo(jnp.full((bs,), s, jnp.int32),
                           jnp.full((bs,), c, jnp.int32),
                           jnp.full((bs,), b, jnp.int32),
                           jax.random.fold_in(key, 100 + n_))
        grids.append(out)
        if (s, c) in holdout:
            print(f"held-out combo (shape={s}, color={c}, bbox={b}) sampled")
    grid = jnp.concatenate(grids, axis=0)
    path = save_grid(grid, f"{mgr.results_dir}/bbox_composition_grid.png",
                     nrow=3 * bs)
    save_yaml(cfg, f"{mgr.logs_dir}/compose_bbox_config.yaml")
    print(f"27-combination (3 shapes x 3 colors x 3 bbox colors) grid "
          f"saved to {path}")


if __name__ == "__main__":
    main()
