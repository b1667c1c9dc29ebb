#!/usr/bin/env python
"""6-panel reverse-composition trajectory vs noised ground truth (parity:
/root/reference/mnist/visualize_composition_latent.py:89-117): compose two
latent-2D experts by eps-sum, snapshot the trajectory at t in {1, .8, ..., 0},
and scatter each snapshot against the forward-noised data."""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from _common import add_runtime_flags, apply_runtime_flags, build_dataset, build_model
from composable_diffusion_models_tpu import compose, samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.ops.pca import load_pca
from composable_diffusion_models_tpu.schedules import VPSchedule
from composable_diffusion_models_tpu.utils import get_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_latent2d")
    ap.add_argument("--pca", default=None,
                    help="PCA prefix (default: <out>/pca)")
    ap.add_argument("--experts", default='["latent_expert"]')
    ap.add_argument("--n_steps", type=int, default=500)
    ap.add_argument("--mode", default="sum", choices=["sum", "ito", "avg"],
                    help="composition: eps-sum (visualize_composition_latent)"
                         " | divergence-kappa (…_latent_ito) | fixed kappa 0.5"
                         " (…_latent_avg)")
    ap.add_argument("--sampler", default="em", choices=["em", "ddim", "ode"],
                    help="em = 6-panel trajectory; ddim/ode = final scatter "
                         "(…_latent_ddim / ito ODE variants)")
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

    def expert_eps(i):
        def f(x, t):
            return model.apply(params_list[i], jnp.full((x.shape[0],), t), x)
        return f

    def eps_fn(x, t):
        stack = jnp.stack([expert_eps(i)(x, t)
                           for i in range(len(params_list))])
        if args.mode == "avg":
            # fixed kappa = 1/K (…_latent_avg.py:89-99)
            return compose.fixed(stack, jnp.full((len(params_list),),
                                                 1.0 / len(params_list)))
        # unnormalized eps-SUM (visualize_composition_latent.py:76-78 —
        # NOT the weighted mean; the sum doubles the score of shared mass)
        return compose.fixed(stack, jnp.ones((len(params_list),)))

    z_init = jax.random.normal(key, (512, 2))
    if args.mode == "ito":
        assert len(params_list) == 2, "ito kappa composition takes 2 experts"
        # sigma-scaled scores s = -eps (notebook convention: net outputs -eps)
        score_fns = tuple(
            (lambda f: lambda x, t: -f(x, t))(expert_eps(i)) for i in (0, 1))
        z = samplers.ito_kappa_ode(score_fns, schedule, key, z_init,
                                   args.n_steps)
        traj = z[None]
    elif args.sampler == "ddim":
        traj = samplers.ddim(eps_fn, schedule, z_init, args.n_steps,
                             clip=None)[None]
    elif args.sampler == "ode":
        # true score = -eps / sigma
        traj = samplers.prob_flow_ode(
            lambda x, t: -eps_fn(x, t) / schedule.sigma(t), schedule, z_init,
            args.n_steps)[None]
    else:
        traj = samplers.euler_maruyama_traj(eps_fn, schedule, key, z_init,
                                            args.n_steps)

    # ground-truth latents for the forward-noise comparison panels
    images, _ = build_dataset(cfg, jax.random.fold_in(key, 1))
    z_gt = load_pca(args.pca).encode(images)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    lim = float(jnp.abs(z_gt).max()) * 1.2
    if traj.shape[0] == 1:
        # single final-state panel (ddim / ode / ito variants)
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(*np.asarray(z_gt).T, s=3, alpha=0.3, label="data")
        ax.scatter(*np.asarray(traj[0]).T, s=3, alpha=0.5, color="green",
                   label=f"composed ({args.mode}/{args.sampler})")
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.grid(True)
        ax.legend()
    else:
        t_panels = [1.0, 0.8, 0.6, 0.4, 0.2, 0.0]
        fig, axes = plt.subplots(1, 6, figsize=(24, 4))
        for ax, t in zip(axes, t_panels):
            step = int((1.0 - t) * args.n_steps)
            xt_gt, _ = schedule.q_t(jax.random.fold_in(key, step), z_gt,
                                    jnp.full((z_gt.shape[0],), max(t, 1e-3)))
            ax.scatter(*np.asarray(xt_gt).T, s=3, alpha=0.3,
                       label="noised data")
            ax.scatter(*np.asarray(traj[step]).T, s=3, alpha=0.5,
                       color="green", label="composed")
            ax.set_title(f"t={t}")
            ax.set_xlim(-lim, lim)
            ax.set_ylim(-lim, lim)
            ax.grid(True)
        axes[0].legend()
    path = os.path.join(
        mgr.results_dir,
        f"composition_trajectory_{args.mode}_{args.sampler}.png")
    fig.savefig(path, bbox_inches="tight", dpi=100)
    print(f"trajectory panels saved to {path}")


if __name__ == "__main__":
    main()
