#!/usr/bin/env python
"""Throughput probe for candidate DiT flagship configs on the headline
bench workload (MNIST 28x28, 50-step DDIM, 3 composed experts).

Companion to scripts/quality_gate_flagship.py (VERDICT r2 #1): the gate
scores a candidate's generation quality; this prices it. Same compute
path as bench.py's measure_dit_throughput but with patch/dim/depth as
CLI parameters so the quality/throughput frontier can be swept.

Timing follows DESIGN.md §4: warm the exact program, then time eager
repeats of the whole 50-step jitted scan (per-call dispatch ~25 ms is
<3% of a batch at these sizes); result forced via the scan output, which
DCE cannot slice through.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import add_runtime_flags, apply_runtime_flags  # noqa: E402

from composable_diffusion_models_tpu import compose, experts, samplers  # noqa: E402
from composable_diffusion_models_tpu.models import DiT  # noqa: E402
from composable_diffusion_models_tpu.schedules import VPSchedule  # noqa: E402
from bench import dit_gflop_per_image  # noqa: E402


def measure(patch: int, dim: int, depth: int, batch_size: int,
            iters: int, n_steps: int, peak_tflops: float) -> dict:
    key = jax.random.PRNGKey(0)
    model = DiT(patch=patch, dim=dim, depth=depth, in_channels=1,
                dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 28, 28, 1))
    params_list = [
        jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16),
            model.init(jax.random.fold_in(key, i), x0, jnp.ones((1,))))
        for i in range(3)
    ]
    stack = experts.ExpertStack(model.apply, params_list)
    schedule = VPSchedule()
    w = jnp.ones((3,), jnp.float32)

    def eps_fn(x, t):
        eps = stack(x.astype(jnp.bfloat16), t.astype(jnp.bfloat16))
        return compose.weighted(eps.astype(jnp.float32), w)

    @jax.jit
    def sample(key):
        x = jax.random.normal(key, (batch_size, 28, 28, 1), jnp.float32)
        return samplers.ddim(eps_fn, schedule, x, n_steps)

    sample(key).block_until_ready()          # warm the exact program
    t0 = time.perf_counter()
    outs = [sample(jax.random.fold_in(key, 1 + i)) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    ips = batch_size * iters / dt
    gfi = dit_gflop_per_image(28, patch, dim, depth, 3, n_steps)
    return {
        "patch": patch, "dim": dim, "depth": depth,
        "batch_size": batch_size, "n_steps": n_steps,
        "images_per_sec": round(ips, 1),
        "gflop_per_image": round(gfi, 2),
        "implied_tflops": round(ips * gfi / 1e3, 1),
        "mfu": round(ips * gfi / 1e3 / peak_tflops, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="p7_d256_l6",
                    help="comma list of p<patch>_d<dim>_l<depth>")
    ap.add_argument("--batch_sizes", default="256,512,1024")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--n_steps", type=int, default=50)
    ap.add_argument("--peak_tflops", type=float, default=195.0,
                    help="calibrated bf16 matmul peak on this chip "
                         "(DESIGN.md §4)")
    add_runtime_flags(ap)
    args, _ = ap.parse_known_args()
    apply_runtime_flags(args)

    rows = []
    for cfg in args.configs.split(","):
        parts = {p[0]: int(p[1:]) for p in cfg.split("_")}
        for bs in [int(b) for b in args.batch_sizes.split(",")]:
            r = measure(parts["p"], parts["d"], parts["l"], bs,
                        args.iters, args.n_steps, args.peak_tflops)
            rows.append(r)
            print(json.dumps(r))
    best = max(rows, key=lambda r: r["images_per_sec"])
    print("# best:", json.dumps(best))


if __name__ == "__main__":
    main()
