#!/usr/bin/env python
"""CIFAR-10 class-split SUPERDIFF composition (VERDICT r2 #7).

The reference's CIFAR experiment (/root/reference/src/composing_colored_mnist.py
:321-329 config, :237-310 sampler): train unconditional experts on the class
splits {0-4} and {5-9}, compose with the density-tracked SUPERDIFF sampler,
save a comparison grid of (expert-A solo | expert-B solo | composed).

No network egress here, so when no real CIFAR binaries exist the run uses the
procedural stand-in (data.synthetic_cifar10 — 10 visually distinct classes),
serialized to CIFAR's on-disk binary-batch format and read back through the
SAME tested parse path (data.load_cifar10) a real download would use. The
grid/JSON artifacts are labeled stand-in accordingly.

Beyond the reference (which eyeballs the grid): a 10-class probe reports the
class histogram, split balance, and confidence of each sample set.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import add_runtime_flags, apply_runtime_flags  # noqa: E402

from composable_diffusion_models_tpu import (  # noqa: E402
    data, eval as ceval, samplers, train)
from composable_diffusion_models_tpu.models import UNet  # noqa: E402
from composable_diffusion_models_tpu.schedules import DDPMSchedule  # noqa: E402
from composable_diffusion_models_tpu.utils.viz import save_grid  # noqa: E402

SPLIT_A, SPLIT_B = tuple(range(5)), tuple(range(5, 10))


def probe_stats(probe, probe_params, samples):
    logits = ceval._jitted_apply(probe)(probe_params, samples)[0]
    probs = jax.nn.softmax(logits, axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    hist = jnp.bincount(preds, length=10) / preds.shape[0]
    return {"class_hist": [round(float(h), 4) for h in hist],
            "frac_split_a": float(jnp.mean(preds < 5)),
            "mean_max_prob": float(jnp.mean(jnp.max(probs, axis=-1)))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--train_steps", type=int, default=12000)
    ap.add_argument("--batch_size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--ema", type=float, default=0.999)
    ap.add_argument("--base_dim", type=int, default=64)
    ap.add_argument("--temp", type=float, default=1.0)
    ap.add_argument("--probe_steps", type=int, default=2000)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--data_n", type=int, default=8192)
    ap.add_argument("--data_dir", default=None,
                    help="real CIFAR binary dir; default: auto-discover, "
                         "else procedural stand-in")
    ap.add_argument("--sanity", action="store_true")
    ap.add_argument("--out", default="outputs/cifar_split")
    ap.add_argument("--seed", type=int, default=0)
    add_runtime_flags(ap)
    args, _ = ap.parse_known_args()
    apply_runtime_flags(args)

    if args.sanity:
        args.train_steps, args.probe_steps, args.T = 40, 40, 8
        args.n_samples, args.data_n, args.base_dim = 8, 320, 8
        args.batch_size = 16

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)

    loaded = data.load_cifar10(args.data_dir)
    standin = loaded is None
    if standin:
        print("no CIFAR binaries found: generating the procedural stand-in "
              "and round-tripping it through the binary format ...")
        raw, lab = data.synthetic_cifar10(jax.random.fold_in(key, 1),
                                          args.data_n)
        bin_dir = data.write_cifar10_binaries(
            jax.device_get(raw), jax.device_get(lab),
            os.path.join(args.out, "cifar-10-batches-bin"))
        loaded = data.load_cifar10(bin_dir)
        assert loaded is not None, "binary round-trip failed"
    imgs, labels = loaded
    imgs, labels = imgs[:args.data_n], labels[:args.data_n]
    print(f"dataset: {imgs.shape} ({'procedural stand-in' if standin else 'real CIFAR-10'})")

    print("training 10-class probe ...")
    probe, probe_params = ceval.train_probe(
        jax.random.fold_in(key, 2), imgs, (labels,), num_classes=(10,),
        steps=args.probe_steps, noise_aug=0.1)
    print("probe held-in:", ceval.probe_accuracy(
        probe, probe_params, imgs[:512], (labels[:512],)))

    schedule = DDPMSchedule(num_timesteps=args.T)
    model = UNet(in_channels=3, base_dim=args.base_dim,
                 channel_mults=(1, 2, 4))
    params = []
    for i, split in enumerate((SPLIT_A, SPLIT_B)):
        mask = jnp.isin(labels, jnp.asarray(split))
        split_imgs = imgs[mask]
        print(f"training expert {i} (classes {split}, "
              f"{split_imgs.shape[0]} images) ...")
        p0 = model.init(jax.random.fold_in(key, 10 + i),
                        jnp.zeros((1,) + imgs.shape[1:]), jnp.ones((1,)))
        p, losses = train.train_expert(
            jax.random.fold_in(key, 20 + i), model.apply, p0, schedule,
            split_imgs, steps=args.train_steps, batch_size=args.batch_size,
            lr=args.lr, ema_decay=args.ema or None)
        print(f"  final loss {float(losses[-1]):.4f}")
        params.append(p)
    p_a, p_b = params

    bs = args.n_samples
    shape = (bs,) + imgs.shape[1:]

    def eps_stack_fn(x, ti):
        t = ti.astype(jnp.float32)
        return jnp.stack([model.apply(p_a, x, t), model.apply(p_b, x, t)])

    report = {"dataset": ("procedural stand-in (synthetic_cifar10, via the "
                          "binary-batch parse path)" if standin
                          else "real CIFAR-10 binaries"),
              "splits": [list(SPLIT_A), list(SPLIT_B)], "T": args.T,
              "train_steps": args.train_steps, "sets": {}}
    grids = []
    jobs = [("solo_A", lambda k: samplers.ddpm_ancestral(
                lambda x, t: model.apply(p_a, x, t), schedule, k,
                jax.random.normal(jax.random.fold_in(k, 1), shape))),
            ("solo_B", lambda k: samplers.ddpm_ancestral(
                lambda x, t: model.apply(p_b, x, t), schedule, k,
                jax.random.normal(jax.random.fold_in(k, 1), shape))),
            ("superdiff_OR", lambda k: samplers.superdiff(
                eps_stack_fn, schedule, k,
                jax.random.normal(jax.random.fold_in(k, 1), shape),
                operation="OR", temp=args.temp))]
    for name, fn in jobs:
        print(f"sampling {name} ...")
        samples = jnp.clip(jax.jit(fn)(jax.random.fold_in(key, 50)), -1, 1)
        stats = probe_stats(probe, probe_params, samples)
        report["sets"][name] = stats
        grids.append(samples[:16])
        save_grid(samples[:64], f"{args.out}/cifar_{name}.png", nrow=8)
        print(f"  {name}: frac_A={stats['frac_split_a']:.3f} "
              f"conf={stats['mean_max_prob']:.3f}")

    # the reference's visualize_results layout: A block / B block / composed
    save_grid(jnp.concatenate(grids, axis=0),
              f"{args.out}/cifar_comparison.png", nrow=16)
    or_stats = report["sets"]["superdiff_OR"]
    report["or_mixture_balance_error"] = abs(0.5 - or_stats["frac_split_a"])
    path = f"{args.out}/cifar_split_composition.json"
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report saved to {path}")


if __name__ == "__main__":
    main()
