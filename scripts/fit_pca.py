#!/usr/bin/env python
"""Fit the PCA latent codec on a dataset (parity: /root/reference/mnist/fit_pca.py,
shapes/fit_pca_shapes.py — sklearn replaced by one on-device eigendecomposition)."""

import argparse
import os

import jax

from _common import add_runtime_flags, apply_runtime_flags, build_dataset
from composable_diffusion_models_tpu.ops.pca import fit_pca, save_pca
from composable_diffusion_models_tpu.utils import get_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="mnist_latent2d")
    ap.add_argument("--components", type=int, default=2)
    ap.add_argument("--out", default="outputs")
    ap.add_argument("--name", default="pca")
    add_runtime_flags(ap)
    args, overrides = ap.parse_known_args()
    apply_runtime_flags(args)

    cfg = get_config(args.preset, overrides)
    key = jax.random.PRNGKey(cfg.train.seed)
    images, _ = build_dataset(cfg, key)
    pca = fit_pca(images, args.components)
    os.makedirs(args.out, exist_ok=True)
    prefix = os.path.join(args.out, args.name)
    save_pca(prefix, pca)
    ev = [float(v) for v in pca.explained_variance]
    print(f"PCA({args.components}) fit on {images.shape[0]} examples; "
          f"explained variance {ev}; saved to {prefix}_*.npy")


if __name__ == "__main__":
    main()
