"""On-device PCA latent codec (C1-C3).

The reference fits sklearn PCA on the host and persists .npy / joblib
artifacts (/root/reference/mnist/fit_pca.py:22-26,
shapes/fit_pca_shapes.py:28-32). Here the fit is one jitted eigendecomposition
of the feature covariance (D x D, D <= 12288 for these datasets — far cheaper
than an N x D SVD) and encode/decode are plain GEMMs that XLA maps straight
onto the MXU.

Conventions match sklearn: components rows are unit principal axes sorted by
explained variance; encode z = (x - mean) @ W^T, decode x = z @ W + mean
(mnist/train_latent_2d.py:51, mnist/sample_latent.py:88). Component SIGN is
arbitrary (as in sklearn across versions); tests assert on reconstructions,
not raw signs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class PCA(NamedTuple):
    mean: Array          # (D,)
    components: Array    # (k, D)
    explained_variance: Array  # (k,)

    def encode(self, x: Array) -> Array:
        flat = x.reshape(x.shape[0], -1)
        return (flat - self.mean) @ self.components.T

    def decode(self, z: Array, shape: Tuple[int, ...] = None) -> Array:
        flat = z @ self.components + self.mean
        return flat if shape is None else flat.reshape(z.shape[0], *shape)


def fit_pca(x: Array, n_components: int) -> PCA:
    """Fit PCA on (N, ...) data flattened to (N, D)."""
    flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
    n = flat.shape[0]
    mean = flat.mean(axis=0)
    centered = flat - mean
    cov = (centered.T @ centered) / (n - 1)
    evals, evecs = jnp.linalg.eigh(cov)           # ascending
    order = jnp.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T                     # (k, D)
    return PCA(mean, comps, evals[order])


def save_pca(path_prefix: str, pca: PCA) -> None:
    """Persist as raw arrays, the reference's .npy contract
    (pca_mean.npy / pca_components.npy, mnist/fit_pca.py:25-26)."""
    import numpy as np
    np.save(path_prefix + "_mean.npy", np.asarray(pca.mean))
    np.save(path_prefix + "_components.npy", np.asarray(pca.components))
    np.save(path_prefix + "_explained_variance.npy",
            np.asarray(pca.explained_variance))


def load_pca(path_prefix: str) -> PCA:
    import numpy as np
    return PCA(jnp.asarray(np.load(path_prefix + "_mean.npy")),
               jnp.asarray(np.load(path_prefix + "_components.npy")),
               jnp.asarray(np.load(path_prefix + "_explained_variance.npy")))
