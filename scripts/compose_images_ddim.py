#!/usr/bin/env python
"""Compose a shape expert (grayscale) + color expert (RGB) with DDIM across
all label combinations (parity: /root/reference/shapes/compose_images_ddim.py:
heterogeneous 1ch/3ch experts via grayscale adapter + channel-broadcast lift,
weighted eps blend, x0-clamped DDIM).
"""

import argparse

import jax

from _common import add_runtime_flags, apply_runtime_flags
import jax.numpy as jnp

from composable_diffusion_models_tpu import compose, experts, samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.models import UNet
from composable_diffusion_models_tpu.schedules import VPSchedule
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import save_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="shapes_ddim")
    ap.add_argument("--shape_expert", default="shape_expert")
    ap.add_argument("--color_expert", default="color_expert")
    ap.add_argument("--w_shape", type=float, default=1.0)
    ap.add_argument("--w_color", type=float, default=1.0)
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--gray_protocol", default="white",
                    choices=["white", "luma", "luma_norm"],
                    help="how the 1-channel shape expert was trained "
                         "(data.gray_mode): 'white' = reference parity "
                         "(white-on-black; its luma view of the RGB state "
                         "is off-manifold and composes poorly); 'luma' = "
                         "trained on luma(RGB data); 'luma_norm' = trained "
                         "on the unit-norm projection (exact gray diffusion "
                         "state; see experts.rgb_to_gray)")
    ap.add_argument("--op", default="avg", choices=["avg", "proj"],
                    help="avg = reference channel-broadcast weighted blend "
                         "(compose_images_ddim.py:52-57 parity); proj = "
                         "projection substitution (compose.projected; needs "
                         "--gray_protocol luma_norm) — the consistent-noise "
                         "composition that actually denoises")
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    key = jax.random.PRNGKey(args.seed)
    schedule = VPSchedule(kind=cfg.schedule.kind)
    size = cfg.data.img_size
    mgr = CheckpointManager(args.out, cfg.name)

    shape_model = UNet(in_channels=1, base_dim=cfg.model.base_dim,
                       channel_mults=tuple(cfg.model.channel_mults),
                       num_classes=(3,))
    color_model = UNet(in_channels=3, base_dim=cfg.model.base_dim,
                       channel_mults=tuple(cfg.model.channel_mults),
                       num_classes=(3,))
    lab0 = jnp.zeros((1,), jnp.int32)
    sp_like = {"params": shape_model.init(
        key, jnp.zeros((1, size, size, 1)), jnp.ones((1,)), lab0), "step": 0}
    cp_like = {"params": color_model.init(
        key, jnp.zeros((1, size, size, 3)), jnp.ones((1,)), lab0), "step": 0}
    sp = mgr.load(args.shape_expert, like=sp_like)["params"]
    cp = mgr.load(args.color_expert, like=cp_like)["params"]

    weights = jnp.array([args.w_shape, args.w_color])

    normalized = args.gray_protocol == "luma_norm"
    if args.op == "proj" and not normalized:
        ap.error("--op proj needs --gray_protocol luma_norm (the gray "
                 "expert must estimate exactly P eps)")

    @jax.jit
    def sample_combo(sl, cl, k):
        # labels traced: ONE compile covers all 9 combos (a per-combo
        # closure would retrace the whole sampler 9 times)
        def eps_fn(x, t):
            e_gray = shape_model.apply(
                sp, experts.rgb_to_gray(x, normalized=normalized), t, sl)
            e_color = color_model.apply(cp, x, t, cl)
            if args.op == "proj":
                return compose.projected(e_color, e_gray, args.w_shape)
            # lift matched to the projection: a luma_norm expert estimates
            # P eps, so its lift is the projection ADJOINT (equal broadcast
            # would scale the luma component 1.49x and leak into chroma);
            # plain-gray experts keep the reference's channel broadcast
            # (compose_images_ddim.py:52)
            return compose.weighted(
                jnp.stack([experts.gray_to_rgb(e_gray, normalized=normalized),
                           e_color]), weights)

        x_init = jax.random.normal(k, (args.bs, size, size, 3))
        return samplers.ddim(eps_fn, schedule, x_init, cfg.sample.n_steps)

    grids = []
    for s_lab in range(3):
        for c_lab in range(3):
            grids.append(sample_combo(
                jnp.full((args.bs,), s_lab, jnp.int32),
                jnp.full((args.bs,), c_lab, jnp.int32),
                jax.random.fold_in(key, s_lab * 3 + c_lab)))
    out = jnp.concatenate(grids, axis=0)
    path = save_grid(out, f"{mgr.results_dir}/ddim_composition_grid.png",
                     nrow=3 * args.bs)
    print(f"3x3 composition grid saved to {path}")


if __name__ == "__main__":
    main()
