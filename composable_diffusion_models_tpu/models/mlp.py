"""MLP score networks for low-dimensional (PCA / VAE latent) diffusion.

Covers (SURVEY.md §2.2):
  * M3 2D score MLP            /root/reference/mnist/models/mlp_2d.py:5-20
  * M9 original JAX MLP        /root/reference/notebook/superposition_edu.py:66-82
  * M8 LatentDiffusionMLP(+CFG) /root/reference/src/4.3 best_of_both_worlds.py:129-150
The call convention is ``model(t, x[, labels...])`` with t of shape (B,) or
(B, 1) — matching the reference's flipped arg order for MLPs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .embeddings import sinusoidal_embedding

Array = jax.Array


class ScoreMLP(nn.Module):
    """Dense(hidden)+swish x depth -> Dense(out); input = concat(t, x).

    depth=4, hidden=512 reproduces the notebook original; depth=3, hidden=256
    reproduces mnist/models/mlp_2d.py.
    """

    hidden: int = 512
    out_dim: int = 2
    depth: int = 4

    @nn.compact
    def __call__(self, t: Array, x: Array) -> Array:
        t = jnp.asarray(t, x.dtype)
        if t.ndim == 0:
            t = jnp.full((x.shape[0], 1), t, x.dtype)
        elif t.ndim == 1:
            t = t[:, None]
        h = jnp.concatenate([t, x], axis=-1)
        for _ in range(self.depth):
            h = nn.swish(nn.Dense(self.hidden)(h))
        return nn.Dense(self.out_dim)(h)


class LatentDiffusionMLP(nn.Module):
    """Latent-space eps predictor over (z, t-emb, label-emb...).

    ``num_classes`` is a tuple of label-slot vocab sizes; ``null_token``
    reserves an extra row per slot for classifier-free guidance (the _4
    variant, /root/reference/src/4.3 best_of_both_worlds_4.py:148-169).
    Discrete-time models pass integer t (scaled by 1/T before embedding).
    """

    latent_dim: int = 10
    hidden: int = 256
    depth: int = 3
    time_emb_dim: int = 64
    num_classes: Sequence[int] = ()
    null_token: bool = False

    @nn.compact
    def __call__(self, t: Array, z: Array, *labels: Array) -> Array:
        t = jnp.asarray(t, jnp.float32)
        if t.ndim == 0:
            t = jnp.full((z.shape[0],), t)
        t = t.reshape(z.shape[0])
        t_emb = sinusoidal_embedding(t, self.time_emb_dim)
        parts = [z, t_emb]
        for i, n in enumerate(self.num_classes):
            vocab = n + (1 if self.null_token else 0)
            parts.append(nn.Embed(vocab, self.time_emb_dim,
                                  name=f"label_emb_{i}")(labels[i]))
        h = jnp.concatenate(parts, axis=-1)
        for _ in range(self.depth):
            h = nn.swish(nn.Dense(self.hidden)(h))
        return nn.Dense(self.latent_dim)(h)
