#!/usr/bin/env python
"""The 2D SUPERDIFF teaching example, end-to-end (parity:
/root/reference/notebook/superposition_edu.py — train up/down half experts on
the 4-Gaussian grid, compose with the Ito-kappa equal-density path, track
per-expert log-likelihoods)."""

import argparse
import os

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_model  # noqa: F401 (path setup)
from composable_diffusion_models_tpu import data, samplers, train
from composable_diffusion_models_tpu.models import ScoreMLP
from composable_diffusion_models_tpu.schedules import VPSchedule
from composable_diffusion_models_tpu.utils.viz import scatter2d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--bs", type=int, default=512)
    ap.add_argument("--n_sample_steps", type=int, default=1000)
    ap.add_argument("--out", default="outputs/superposition_2d")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sanity", action="store_true")
    add_runtime_flags(ap)
    args = ap.parse_args()
    apply_runtime_flags(args)
    if args.sanity:
        args.steps, args.n_sample_steps = 500, 100

    key = jax.random.PRNGKey(args.seed)
    sch = VPSchedule(kind="jax_faithful")
    m = ScoreMLP(hidden=args.hidden, depth=4, out_dim=2)
    os.makedirs(args.out, exist_ok=True)

    def train_one(k, up):
        pts = data.toy2d(k, 65536, up=up)
        p = m.init(k, jnp.ones((4, 1)), jnp.zeros((4, 2)))
        # net learns sdlogqdx = -eps (the notebook's (eps + net)^2 loss)
        p, losses = train.train_expert(
            k, lambda pp, t, x: -m.apply(pp, t, x), p, sch, pts,
            steps=args.steps, batch_size=args.bs, lr=2e-4, time_first=True,
            steps_per_scan=min(500, args.steps))
        return p, losses

    p_up, _ = train_one(jax.random.fold_in(key, 1), True)
    p_down, _ = train_one(jax.random.fold_in(key, 2), False)

    def score_fn(p):
        return lambda x, t: m.apply(p, jnp.full((x.shape[0],), t), x)

    x_init = jax.random.normal(key, (512, 2))
    out, ll = samplers.superposition_2d((score_fn(p_up), score_fn(p_down)),
                                        sch, key, x_init, args.n_sample_steps)
    scatter2d(out, f"{args.out}/composed_and.png",
              title="Ito-kappa AND of up/down experts")
    scatter2d(jnp.stack([ll[0], ll[1]], 1), f"{args.out}/log_likelihoods.png",
              title="per-expert integrated log-likelihood", lim=float(jnp.abs(ll).max()))
    gt = data.toy2d(key, 512, up=True)
    scatter2d(gt, f"{args.out}/ground_truth_up.png", title="up-half data")
    print(f"2D superposition artifacts in {args.out}; "
          f"|ll1 - ll2| mean = {float(jnp.abs(ll[0] - ll[1]).mean()):.3f}")


if __name__ == "__main__":
    main()
