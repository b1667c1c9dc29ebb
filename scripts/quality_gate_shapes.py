#!/usr/bin/env python
"""Quality gate for the shapes-64 secondary bench workload (VERDICT r3
item 6).

The shapes bench row (bench.py measure_shapes_throughput — 64x64 RGB,
2 conditional experts, 50-step DDIM weighted-average composition,
/root/reference/shapes/compose_images_ddim.py:21-70) is served by the
reference-parity base-64 UNet at its measured architectural ceiling of
~217 img/s (DESIGN.md §3.2 — sum-of-parts, no hidden headroom). A 64x64
DiT is NOT at its ceiling (256 tokens at p4 is the regime where the DiT
already sustains 45% MFU), so a DiT candidate can beat the row — IF it
matches the UNet's composition quality. This script is that gate:

  1. train a shape-conditional and a color-conditional expert on the full
     procedural shapes dataset (the bench workload composes known cells;
     holdout generalization is eval_composition.py's job, not this gate's);
  2. run the EXACT bench program per (shape, color) cell — 2-expert
     weighted-average 50-step DDIM, bf16, DiT candidates through the
     folded serving path — and score every cell with a full-data
     two-factor probe;
  3. judge vs a baseline run (scripts/quality_gate_flagship.py.judge):
     mean/min cell joint accuracy within --tol, per-cell feature diversity
     >= --div_frac x baseline, FID-lite <= --fid_slack x baseline.

Config names: unet<W> or dit_p<P>_d<D>_l<L> (img 64 must divide P).
Outputs one JSON + grids per config under --out; exits nonzero if any
candidate FAILs (same contract as the MNIST gate).
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import (add_runtime_flags, apply_runtime_flags,
                     require_accelerator)  # noqa: E402
from quality_gate_flagship import judge  # noqa: E402

from composable_diffusion_models_tpu import (  # noqa: E402
    compose, data, eval as ceval, experts, samplers, train)
from composable_diffusion_models_tpu.models import DiT, UNet  # noqa: E402
from composable_diffusion_models_tpu.schedules import VPSchedule  # noqa: E402
from composable_diffusion_models_tpu.utils.viz import save_grid  # noqa: E402

SHAPES_CRITERIA = (
    ("cell_joint_mean", lambda r: r["composed"]["joint_mean"], ">=", "tol"),
    ("cell_joint_min", lambda r: r["composed"]["joint_min"], ">=", "tol"),
    ("cell_diversity", lambda r: r["composed"]["diversity_mean"], ">=",
     "frac"),
    ("composed_fid", lambda r: r["composed"]["fid_probe"], "<=", "slack"),
)


def build_model(name: str, dtype, img: int):
    """Returns (train_model, serve_fn).

    DiT candidates TRAIN in fp32 compute and SERVE in bf16 through the
    folded path (the param tree is dtype-free; scoring casts it to bf16 —
    exactly the production split). Measured necessity: at 64x64 the bf16
    DiT training pass detonates late in training under MULTIPLE recipes
    (min-SNR was the first confirmed trigger; a plain-loss clipped run
    then detonated the color expert the same way, loss -> ~1.0 permanent).
    The shapes data trains to loss ~5e-4 — 30x below the MNIST runs that
    never detonate — so bf16 rounding noise in the residual stream is the
    dominant gradient signal late in training. fp32 removes the trigger;
    knob ladder in artifacts/quality_gate_shapes_r5/p8_divergence_repro.log.
    """
    if name.startswith("unet"):
        m = UNet(in_channels=3, base_dim=int(name[4:]),
                 channel_mults=(1, 2, 4), num_classes=(3,), dtype=dtype)
        return m, m.apply
    if name.startswith("dit"):
        from composable_diffusion_models_tpu.models import make_folded_apply
        parts = {p[0]: int(p[1:]) for p in name.split("_")[1:]}
        if img % parts["p"]:
            raise ValueError(f"img {img} not divisible by patch {parts['p']}")
        kw = dict(patch=parts["p"], dim=parts["d"], depth=parts["l"],
                  n_heads=parts.get("h", 8), in_channels=3, num_classes=(3,))
        m_train = DiT(dtype=None, **kw)          # fp32 training compute
        m_serve = DiT(dtype=dtype, **kw)         # bf16 folded serving
        return m_train, make_folded_apply(m_serve)
    raise ValueError(f"unknown config {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="unet64,dit_p8_d256_l8")
    ap.add_argument("--baseline", default="unet64",
                    help="config name in --configs or a prior quality_*.json")
    ap.add_argument("--train_steps", type=int, default=12000)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--snr_gamma", type=float, default=0.0,
                    help="min-SNR loss weighting (0 disables — the r5 "
                         "DEFAULT: under gamma=5 the 64x64 DiT expert "
                         "trains to loss ~0.001 then deterministically "
                         "detonates at 10-20k steps across lr 2e-4/1e-4/"
                         "5e-5, with clipping, with adam_eps 1e-5; plain "
                         "loss is stable to 24k at final 0.0006 — knob "
                         "ladder in artifacts/quality_gate_shapes_r5/"
                         "p8_divergence_repro.log. The r4 unet-only gate "
                         "ran gamma=5; the gate is relative so baseline "
                         "and candidates always share one recipe)")
    ap.add_argument("--clip_norm", type=float, default=1.0,
                    help="global-norm gradient clipping (0 disables); "
                         "binds only on spike steps")
    ap.add_argument("--probe_steps", type=int, default=2000)
    ap.add_argument("--samples_per_cell", type=int, default=64)
    ap.add_argument("--n_steps", type=int, default=50)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--data_n", type=int, default=8192)
    ap.add_argument("--tol", type=float, default=0.02)
    ap.add_argument("--div_frac", type=float, default=0.5)
    ap.add_argument("--fid_slack", type=float, default=1.5)
    ap.add_argument("--sanity", action="store_true")
    ap.add_argument("--out", default="outputs/quality_gate_shapes")
    ap.add_argument("--seed", type=int, default=0)
    add_runtime_flags(ap)
    args, _ = ap.parse_known_args()
    apply_runtime_flags(args)
    if not args.cpu:
        require_accelerator()

    if args.sanity:
        args.train_steps, args.probe_steps = 40, 200
        args.samples_per_cell, args.n_steps = 8, 4
        args.data_n, args.batch_size, args.img = 512, 16, 16

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    schedule = VPSchedule()
    dtype = jnp.bfloat16

    full_imgs, full_s, full_c = data.make_shapes_dataset(args.data_n,
                                                         args.img)
    print("training 2-factor probe on full shapes data ...")
    probe, probe_params = ceval.train_probe(
        jax.random.fold_in(key, 1), full_imgs, (full_s, full_c),
        num_classes=(3, 3), steps=args.probe_steps, noise_aug=0.1)
    print("probe held-in:", ceval.probe_accuracy(
        probe, probe_params, full_imgs[:512], (full_s[:512], full_c[:512])))
    real_feats = ceval.probe_features(probe, probe_params, full_imgs[:2048])

    reports = {}
    scorers = {}
    for cfg_name in args.configs.split(","):
        print(f"=== config {cfg_name} ===")
        model, serve_fn = build_model(cfg_name, dtype, args.img)
        x0 = jnp.zeros((1, args.img, args.img, 3))
        lab0 = jnp.zeros((1,), jnp.int32)
        params_list = []
        for i, labels in enumerate((full_s, full_c)):
            print(f"training {'shape' if i == 0 else 'color'}-conditional "
                  "expert ...")
            p0 = model.init(jax.random.fold_in(key, 10 + i), x0,
                            jnp.ones((1,)), lab0)
            p, losses = train.train_expert(
                jax.random.fold_in(key, 20 + i), model.apply, p0, schedule,
                full_imgs, (labels,), steps=args.train_steps,
                batch_size=args.batch_size, lr=args.lr,
                ema_decay=args.ema or None,
                snr_gamma=args.snr_gamma or None,
                clip_norm=args.clip_norm or None)
            print(f"  final loss {float(losses[-1]):.4f}")
            params_list.append(jax.tree_util.tree_map(
                lambda a: a.astype(dtype), p))

        # the EXACT bench program (measure_shapes_throughput): 2-expert
        # weighted average, labels per_expert, one jitted 50-step DDIM scan;
        # cell labels are traced args so one compile covers all 9 cells
        stack = experts.ExpertStack(serve_fn, params_list)
        w = jnp.ones((2,), jnp.float32)

        report = {"config": cfg_name, "workload": "shapes64_2expert_ddim50",
                  "train_steps": args.train_steps, "img": args.img,
                  "snr_gamma": args.snr_gamma,
                  "clip_norm": args.clip_norm,
                  "n_samples": args.samples_per_cell,
                  "cells": {}, "composed": None}

        def score(bs, seed_salt, save_png=True, cfg_name=cfg_name,
                  stack=stack):
            """All-9-cell scoring at a given per-cell sample count /
            sampling seed — re-invoked by the near-boundary escalation
            (VERDICT r4 item 6) with 4x samples and a fresh seed."""
            import numpy as np

            def eps_fn(x, t, labs):
                eps = stack(x.astype(dtype), t.astype(dtype),
                            experts.per_expert(labs))
                return compose.weighted(eps.astype(jnp.float32), w)

            @jax.jit
            def composed(k, labs):
                x = jax.random.normal(k, (bs, args.img, args.img, 3),
                                      jnp.float32)
                return samplers.ddim(lambda xx, tt: eps_fn(xx, tt, labs),
                                     schedule, x, args.n_steps)

            # cell labels are batch-constant: the folded DiT serving path
            # folds them into per-step weights and requires shape (K, 1);
            # the UNet path keeps measure_shapes_throughput's (K, B) layout
            lab_cols = 1 if cfg_name.startswith("dit") else bs
            out = {"cells": {}, "composed": None}
            cell_stats, grids, all_feats, cell_divs = [], [], [], []
            for s in range(3):
                for c in range(3):
                    labs = jnp.stack([jnp.full((lab_cols,), s, jnp.int32),
                                      jnp.full((lab_cols,), c, jnp.int32)])
                    samples = composed(
                        jax.random.fold_in(key, seed_salt + 40 + 3 * s + c),
                        labs)
                    samples = jnp.clip(samples, -1, 1)
                    grids.append(samples[:4])
                    scores = ceval.compositional_scores(
                        probe, probe_params, samples, (s, c))
                    feats = ceval.probe_features(probe, probe_params,
                                                 samples)
                    all_feats.append(feats)
                    f = np.asarray(feats)
                    dmat = np.sqrt(np.maximum(
                        ((f[:, None, :] - f[None, :, :]) ** 2).sum(-1), 0.0))
                    iu = np.triu_indices(f.shape[0], k=1)
                    cell_divs.append(float(dmat[iu].mean()))
                    out["cells"][f"{s},{c}"] = scores
                    cell_stats.append(scores["joint_acc"])
                    print(f"cell ({s},{c}): joint={scores['joint_acc']:.3f}")
            feats_all = jnp.concatenate(all_feats, axis=0)
            out["composed"] = {
                "joint_mean": float(np.mean(cell_stats)),
                "joint_min": float(np.min(cell_stats)),
                "diversity_mean": float(np.mean(cell_divs)),
                "diversity_min": float(np.min(cell_divs)),
                "fid_probe": round(
                    ceval.frechet_probe_distance(feats_all, real_feats), 4),
            }
            if save_png:
                save_grid(jnp.concatenate(grids, axis=0),
                          f"{args.out}/{cfg_name}_cells.png", nrow=12)
            cm = out["composed"]
            print(f"{cfg_name}: joint mean={cm['joint_mean']:.3f} "
                  f"min={cm['joint_min']:.3f} div={cm['diversity_mean']:.3f} "
                  f"fid={cm['fid_probe']:.2f}")
            return out

        report.update(score(args.samples_per_cell, 0))
        reports[cfg_name] = report
        scorers[cfg_name] = score

    if args.baseline.endswith(".json"):
        with open(args.baseline) as f:
            baseline = json.load(f)
    elif args.baseline in reports:
        baseline = reports[args.baseline]
    else:
        print(f"FATAL: --baseline {args.baseline!r} not found",
              file=sys.stderr)
        sys.exit(2)

    any_fail = False
    for cfg_name, report in reports.items():
        # noise band sized to samples_per_cell — joint_min (the noisiest
        # criterion) is a single-cell fraction at that n
        verdict = judge(report, baseline, args.tol, args.div_frac,
                        args.fid_slack, criteria=SHAPES_CRITERIA,
                        n_samples=args.samples_per_cell)
        if (verdict.get("near_boundary") and report is not baseline
                and not args.sanity and cfg_name in scorers):
            n_esc = 4 * args.samples_per_cell
            print(f"{cfg_name}: near-boundary criteria at "
                  f"n={args.samples_per_cell}/cell — escalating to "
                  f"n={n_esc}/cell, second sampling seed")
            first_pass = {"n_samples": args.samples_per_cell,
                          "cells": report["cells"],
                          "composed": report["composed"], **verdict}
            esc = scorers[cfg_name](n_esc, 1000, save_png=False)
            report["cells"], report["composed"] = (esc["cells"],
                                                   esc["composed"])
            report["n_samples"] = n_esc
            report["escalation"] = {"first_pass": first_pass,
                                    "escalated_n": n_esc,
                                    "second_seed_salt": 1000}
            verdict = judge(report, baseline, args.tol, args.div_frac,
                            args.fid_slack, criteria=SHAPES_CRITERIA,
                            n_samples=n_esc)
        if report is baseline:
            verdict["verdict"] = "BASELINE"
        report.update(verdict)
        report["baseline_config"] = baseline.get("config", args.baseline)
        if verdict["verdict"] == "FAIL":
            any_fail = True
        fails = [k for k, v in verdict["criteria"].items() if not v["ok"]]
        print(f"{cfg_name}: {verdict['verdict']}"
              + (f"  (failed: {', '.join(fails)})" if fails else ""))
        suffix = "" if args.train_steps == 12000 else f"_s{args.train_steps}"
        path = f"{args.out}/quality_shapes_{cfg_name}{suffix}.json"
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report saved to {path}")
    if any_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
