#!/usr/bin/env python
"""Exact log-likelihood / bits-per-dim of a trained score expert.

Beyond-reference capability: the reference only tracks *relative* densities
inside its SUPERDIFF sampler (/root/reference/src/diffusion/samplers.py:50-57)
and publishes no NLL numbers. This evaluator integrates the probability-flow
ODE forward (data -> noise) with the instantaneous change-of-variables
formula (samplers.log_likelihood) and reports bits/dim under the standard
uniform-dequantization convention — the metric diffusion papers use to
compare density models (Song et al. 2021, table 2).

The whole trajectory is one jitted `lax.scan`: batch NLL on the TPU costs
roughly one sampler run.
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp

from _common import (add_runtime_flags, apply_runtime_flags, build_dataset,
                     build_model, build_schedule, init_params)
from composable_diffusion_models_tpu import samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.schedules import VPSchedule
from composable_diffusion_models_tpu.utils import get_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_image")
    ap.add_argument("--name", default="expert")
    ap.add_argument("--n_data", type=int, default=256,
                    help="number of (fresh-key) dataset examples to score")
    ap.add_argument("--n_steps", type=int, default=200,
                    help="forward prob-flow ODE steps (discretization)")
    ap.add_argument("--n_probes", type=int, default=4,
                    help="Hutchinson probes per step (variance of the "
                         "divergence estimate falls as 1/n_probes)")
    ap.add_argument("--probe", default="rademacher",
                    choices=["rademacher", "gaussian"])
    ap.add_argument("--exact", action="store_true",
                    help="exact Jacobian trace (tiny dims only: D forwards "
                         "per ODE step)")
    ap.add_argument("--t_max", type=float, default=None,
                    help="terminal integration time (default: 1.0, or 0.99 "
                         "under schedule.kind=rectified whose g^2 diverges "
                         "at t=1)")
    ap.add_argument("--conditional", action="store_true",
                    help="pass dataset labels to the model (match how the "
                         "expert was trained)")
    ap.add_argument("--label_slots", default=None,
                    help="JSON indices into the dataset label tuple "
                         "(train_image.py convention)")
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    schedule = build_schedule(cfg)
    if not isinstance(schedule, VPSchedule):
        raise SystemExit("eval_nll needs a continuous VP schedule "
                         "(schedule.family=vp); DDPM discrete tables have "
                         "no ODE drift to integrate")
    if cfg.train.predict == "v" and schedule.kind != "stable":
        raise SystemExit("predict='v' identities need "
                         "VPSchedule(kind='stable') (alpha^2 + sigma^2 = 1)")
    key = jax.random.PRNGKey(args.seed)
    model = build_model(cfg)
    mgr = CheckpointManager(args.out, cfg.name)
    like = {"params": init_params(cfg, model, key), "step": 0}
    params = mgr.load(args.name, like=like)["params"]

    # Fresh-key draw so the scored set is not the literal training batch
    # order; with the procedural datasets this is an i.i.d. test draw.
    cfg.data.n = args.n_data
    images, labels = build_dataset(cfg, jax.random.fold_in(key, 7))
    if args.conditional:
        if args.label_slots:
            labels = tuple(labels[s] for s in json.loads(args.label_slots))
        else:
            labels = labels[: len(cfg.model.num_classes)]
    else:
        labels = ()

    def score_fn(x, t):
        eps = model.apply(params, x, t * jnp.ones(x.shape[0]), *labels)
        if cfg.train.predict == "x0":
            # eps-hat from an x0-predictor: eps = (x - alpha x0) / sigma
            eps = (x - schedule.alpha(t) * eps) / schedule.sigma(t)
        elif cfg.train.predict == "v":
            eps = (schedule.sigma(t) * x
                   + schedule.alpha(t) * eps)  # v -> eps identity
        return -eps / schedule.sigma(t)

    if args.t_max is None:
        args.t_max = 0.99 if schedule.kind == "rectified" else 1.0
    ll_fn = jax.jit(lambda x, k: samplers.log_likelihood(
        score_fn, schedule, x, args.n_steps, key=k, probe=args.probe,
        n_probes=args.n_probes, exact=args.exact, t_max=args.t_max)[0])
    ll = ll_fn(images, jax.random.fold_in(key, 11))
    bpd = samplers.bits_per_dim(ll, images.shape[1:])
    bpd_mean = float(bpd.mean())
    bpd_sem = float(bpd.std() / jnp.sqrt(bpd.shape[0]))

    report = {
        "expert": args.name, "preset": args.preset, "n_data": args.n_data,
        "n_steps": args.n_steps, "n_probes": args.n_probes,
        "probe": args.probe, "exact": bool(args.exact),
        "t_max": args.t_max, "schedule_kind": schedule.kind,
        "nll_nats_mean": -float(ll.mean()),
        "bits_per_dim_mean": bpd_mean, "bits_per_dim_sem": bpd_sem,
    }
    os.makedirs(mgr.results_dir, exist_ok=True)
    path = os.path.join(mgr.results_dir, f"nll_{args.name}.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"bits/dim {bpd_mean:.4f} +/- {bpd_sem:.4f} "
          f"(NLL {-float(ll.mean()):.1f} nats) -> {path}")


if __name__ == "__main__":
    main()
