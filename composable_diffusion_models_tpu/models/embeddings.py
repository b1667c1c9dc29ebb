"""Time / label embeddings shared by all score models.

Parity target: SinusoidalPosEmb at /root/reference/mnist/models/unet_small.py:7-19
(log-spaced sin/cos features of the scalar time input).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


def sinusoidal_embedding(t: jax.Array, dim: int) -> jax.Array:
    """(B,) times -> (B, dim) sin/cos features, identical layout to the
    reference: freqs = exp(-log(10000) * arange(half)/ (half-1)), [sin | cos]."""
    if dim % 2 or dim < 4:
        # odd dims would silently return 2*(dim//2) features; dim<=2 makes
        # the (half - 1) divisor 0 and the whole embedding NaN
        raise ValueError(f"sinusoidal_embedding dim must be even and >= 4, "
                         f"got {dim}")
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
                    / (half - 1))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class TimeEmbedding(nn.Module):
    """SinusoidalPosEmb(base_dim) -> Dense -> SiLU -> Dense, as in the
    reference UNet time_mlp (/root/reference/mnist/models/unet_small.py:51-56)."""

    base_dim: int
    emb_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        h = sinusoidal_embedding(t, self.base_dim)
        h = nn.Dense(self.emb_dim, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Dense(self.emb_dim, dtype=self.dtype)(h)
        return h
