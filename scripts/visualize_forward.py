#!/usr/bin/env python
"""Forward-process diagnostic (parity:
/root/reference/mnist/visualize_forward_latent.py:44-69 and
shapes/visualize_forward_shapes.py): scatter PCA latents (or image pixels'
mean/std) under q_t across a time grid to validate schedule + codec.

``--toy2d`` switches to the 2D educational demo
(/root/reference/notebook/diffusion_edu.py:19-60): raw 4-Gaussian-grid toy
points diffused under the jax-faithful sigma = t schedule, scattered over
t in [0, 1] with fixed (-3, 3) limits — no PCA involved."""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from _common import add_runtime_flags, apply_runtime_flags, build_dataset
from composable_diffusion_models_tpu.ops.pca import load_pca
from composable_diffusion_models_tpu.schedules import VPSchedule
from composable_diffusion_models_tpu.utils import get_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_latent2d")
    ap.add_argument("--pca", default="outputs/pca")
    ap.add_argument("--toy2d", action="store_true",
                    help="2D toy forward demo (diffusion_edu.py), no PCA")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--out", default="outputs/forward_diag.png")
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    key = jax.random.PRNGKey(cfg.train.seed)
    if args.toy2d:
        # the edu demo runs the sigma = t notebook convention
        from composable_diffusion_models_tpu import data as data_lib
        schedule = VPSchedule(kind="jax_faithful")
        z = data_lib.toy2d(jax.random.fold_in(key, 1), args.n, up=True)
        labels = jnp.zeros((args.n,), jnp.int32)
        lim = 3.0  # diffusion_edu.py's fixed plot limits
    else:
        schedule = VPSchedule(kind=cfg.schedule.kind)
        images, (labels, *_) = build_dataset(cfg, key)
        z = load_pca(args.pca).encode(images)
        lim = float(jnp.abs(z).max()) * 1.2

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    t_grid = [1e-3, 0.2, 0.4, 0.6, 0.8, 1.0]
    fig, axes = plt.subplots(1, len(t_grid), figsize=(4 * len(t_grid), 4))
    for ax, t in zip(axes, t_grid):
        xt, _ = schedule.q_t(jax.random.fold_in(key, int(t * 1000)), z,
                             jnp.full((z.shape[0],), t))
        for lab in np.unique(np.asarray(labels)):
            sel = np.asarray(labels) == lab
            ax.scatter(*np.asarray(xt)[sel].T, s=3, alpha=0.3)
        ax.set_title(f"t={t}")
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.grid(True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out, bbox_inches="tight", dpi=100)
    print(f"forward-process panels saved to {args.out}")


if __name__ == "__main__":
    main()
