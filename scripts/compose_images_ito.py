#!/usr/bin/env python
"""Ito-kappa (equal-density AND) pixel composition of shape + color experts
(parity: /root/reference/shapes/compose_images_ito_2.py — the 'WARNING: slow'
autograd path replaced by forward-mode jax.jvp divergence inside one scan).
"""

import argparse

import jax

from _common import add_runtime_flags, apply_runtime_flags
import jax.numpy as jnp

from composable_diffusion_models_tpu import experts, samplers
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
    ap.add_argument("--n_steps", type=int, default=1000)
    ap.add_argument("--bs", type=int, default=1)
    ap.add_argument("--probe", default="gaussian",
                    choices=["gaussian", "rademacher"])
    ap.add_argument("--gray_protocol", default="white",
                    choices=["white", "luma", "luma_norm"],
                    help="the 1-channel shape expert's training protocol "
                         "(data.gray_mode; see compose_images_ddim.py)")
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
    sp = mgr.load(args.shape_expert, like={"params": shape_model.init(
        key, jnp.zeros((1, size, size, 1)), jnp.ones((1,)), lab0),
        "step": 0})["params"]
    cp = mgr.load(args.color_expert, like={"params": color_model.init(
        key, jnp.zeros((1, size, size, 3)), jnp.ones((1,)), lab0),
        "step": 0})["params"]

    @jax.jit
    def sample_combo(sl, cl, k_init, k_probe):
        # labels traced: ONE compile covers all 9 combos (a per-combo
        # closure would retrace the whole jvp-sampler 9 times)
        # sigma-scaled scores s = -eps_hat: the divergence is taken of the
        # RGB-lifted shape score w.r.t. the RGB input (the _2.py fix)
        def shape_score(x, t):
            # lift matched to the projection (adjoint for luma_norm, the
            # reference's channel broadcast for plain gray) — the jvp
            # divergence flows through whichever adapter pair is in force,
            # so projection and lift must agree or the divergence is of a
            # mis-scaled field
            normalized = args.gray_protocol == "luma_norm"
            return -experts.gray_to_rgb(
                shape_model.apply(
                    sp, experts.rgb_to_gray(x, normalized=normalized),
                    t, sl),
                normalized=normalized)

        def color_score(x, t):
            return -color_model.apply(cp, x, t, cl)

        x_init = jax.random.normal(k_init, (args.bs, size, size, 3))
        return samplers.ito_kappa_ode(
            (shape_score, color_score), schedule, k_probe, x_init,
            args.n_steps, probe=args.probe)

    grids = []
    for s_lab in range(3):
        for c_lab in range(3):
            grids.append(sample_combo(
                jnp.full((args.bs,), s_lab, jnp.int32),
                jnp.full((args.bs,), c_lab, jnp.int32),
                jax.random.fold_in(key, s_lab * 3 + c_lab),
                jax.random.fold_in(key, 100 + s_lab * 3 + c_lab)))
    out = jnp.concatenate(grids, axis=0)
    path = save_grid(out, f"{mgr.results_dir}/ito_composition_grid.png",
                     nrow=3 * args.bs)
    print(f"Ito-kappa composition grid saved to {path}")


if __name__ == "__main__":
    main()
