#!/usr/bin/env python
"""SUPERDIFF OR/AND composition with the Ito density estimator (parity:
/root/reference/src/diffusion/samplers.py SuperDiffSampler and the _6_1
rigorous-AND variant) over discrete DDPM experts."""

import argparse
import json

import jax
import jax.numpy as jnp

from _common import add_runtime_flags, apply_runtime_flags, build_model, build_schedule, init_params
from composable_diffusion_models_tpu import experts, samplers
from composable_diffusion_models_tpu.checkpoint import CheckpointManager
from composable_diffusion_models_tpu.utils import get_config
from composable_diffusion_models_tpu.utils.viz import save_grid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="colored_mnist_guided")
    ap.add_argument("--experts", default='["expert_a","expert_b"]')
    ap.add_argument("--labels", default=None,
                    help="JSON per-expert label lists, e.g. [[0],[6]]")
    ap.add_argument("--operation", default="OR", choices=["OR", "AND", "AVG", "FIXED"])
    ap.add_argument("--rigorous_and", action="store_true",
                    help="use the Prop.-6 linear-system AND (K=2)")
    ap.add_argument("--kappa", default=None,
                    help="JSON per-expert fixed kappa for --operation FIXED, "
                         "e.g. [0.7,0.3] (reference _6_3.py:368-371)")
    ap.add_argument("--temp", type=float, default=1.0)
    ap.add_argument("--bias", default="0.0",
                    help="scalar, or comma-separated per-expert biases "
                         "(e.g. '0.5,-0.5'). A non-zero scalar is rejected "
                         "in OR mode: softmax is shift-invariant, so it "
                         "would silently sweep nothing")
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--seed", type=int, default=42)
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    key = jax.random.PRNGKey(args.seed)
    sde = build_schedule(cfg)
    model = build_model(cfg)
    mgr = CheckpointManager(args.out, cfg.name)

    names = json.loads(args.experts)
    like = {"params": init_params(cfg, model, key), "step": 0}
    params_list = [mgr.load(n, like=like)["params"] for n in names]
    stack = experts.ExpertStack(model.apply, params_list)

    bs = cfg.sample.batch_size
    n_slots = len(cfg.model.num_classes)
    if args.labels:
        per_expert = jnp.asarray(json.loads(args.labels), jnp.int32)
        if per_expert.shape != (len(names), n_slots):
            ap.error(f"--labels must be a {len(names)}x{n_slots} list "
                     f"(one label per expert per slot), got "
                     f"{tuple(per_expert.shape)}")
        label_args = [experts.per_expert(
            jnp.broadcast_to(per_expert[:, s:s + 1], (len(names), bs)))
            for s in range(n_slots)]
    else:
        # conditional models default to label 0 per slot (pass --labels for
        # per-expert conditioning)
        label_args = [experts.per_expert(
            jnp.zeros((len(names), bs), jnp.int32)) for _ in range(n_slots)]

    def eps_stack_fn(x, ti):
        return stack(x, ti.astype(jnp.float32), *label_args)

    bias_vals = [float(v) for v in str(args.bias).split(",")]
    bias = bias_vals[0] if len(bias_vals) == 1 else jnp.asarray(bias_vals)
    if hasattr(bias, "shape") and bias.shape != (len(names),):
        ap.error(f"--bias needs 1 or {len(names)} values")

    shape = (bs, cfg.data.img_size, cfg.data.img_size, cfg.model.in_channels)
    x_init = jax.random.normal(key, shape)
    if args.rigorous_and:
        if args.operation not in ("OR", "AND"):
            ap.error("--rigorous_and supports --operation OR|AND only")
        out = samplers.superdiff_and_solve(eps_stack_fn, sde, key, x_init,
                                           mode=args.operation,
                                           temp=args.temp, bias=bias,
                                           k_experts=len(names))
    else:
        out = samplers.superdiff(eps_stack_fn, sde, key, x_init,
                                 operation=args.operation, temp=args.temp,
                                 bias=bias,
                                 kappa_fixed=(json.loads(args.kappa)
                                              if args.kappa else None))
    path = save_grid(out, f"{mgr.results_dir}/superdiff_{args.operation}.png")
    print(f"SUPERDIFF {args.operation} samples saved to {path}")


if __name__ == "__main__":
    main()
