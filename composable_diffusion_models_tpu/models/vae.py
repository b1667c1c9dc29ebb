"""Beta-VAE latent codec (M7).

Parity target: /root/reference/src/4.3 best_of_both_worlds.py:57-96 — conv
encoder -> fc mu/logvar (latent 10) -> decoder with Sigmoid output.
TPU-native: NHWC, resize+conv up-path (the XLA-friendly transpose-conv
equivalent).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


class BetaVAE(nn.Module):
    img_size: int = 28
    in_channels: int = 1
    latent_dim: int = 10
    base_dim: int = 32
    channel_mults: Sequence[int] = (1, 2)

    def setup(self):
        n = len(self.channel_mults)
        assert self.img_size % (2 ** n) == 0, "img_size must divide by 2^levels"
        self._s = self.img_size // (2 ** n)
        self._c = self.base_dim * self.channel_mults[-1]
        self.enc_convs = [
            nn.Conv(self.base_dim * m, (3, 3), strides=(2, 2), padding="SAME")
            for m in self.channel_mults
        ]
        self.fc_mu = nn.Dense(self.latent_dim)
        self.fc_logvar = nn.Dense(self.latent_dim)
        self.dec_dense = nn.Dense(self._s * self._s * self._c)
        self.dec_convs = [
            nn.Conv(self.base_dim * m, (3, 3), padding="SAME")
            for m in reversed(self.channel_mults)
        ]
        self.dec_out = nn.Conv(self.in_channels, (3, 3), padding="SAME")

    def encode(self, x: Array) -> Tuple[Array, Array]:
        h = x
        for conv in self.enc_convs:
            h = nn.relu(conv(h))
        h = h.reshape(h.shape[0], -1)
        return self.fc_mu(h), self.fc_logvar(h)

    @staticmethod
    def reparameterize(key: Array, mu: Array, logvar: Array) -> Array:
        std = jnp.exp(0.5 * logvar)
        return mu + std * jax.random.normal(key, mu.shape, mu.dtype)

    def decode(self, z: Array) -> Array:
        h = nn.relu(self.dec_dense(z))
        h = h.reshape(z.shape[0], self._s, self._s, self._c)
        for conv in self.dec_convs:
            b, hh, ww, _ = h.shape
            h = jax.image.resize(h, (b, 2 * hh, 2 * ww, h.shape[-1]), "nearest")
            h = nn.relu(conv(h))
        return nn.sigmoid(self.dec_out(h))

    def __call__(self, x: Array, key: Array) -> Tuple[Array, Array, Array]:
        mu, logvar = self.encode(x)
        z = self.reparameterize(key, mu, logvar)
        return self.decode(z), mu, logvar


def vae_loss(recon: Array, x: Array, mu: Array, logvar: Array,
             beta: float = 1.0) -> Array:
    """BCE reconstruction + beta * KL, both summed per example then meaned."""
    eps = 1e-6
    recon = jnp.clip(recon, eps, 1.0 - eps)
    bce = -(x * jnp.log(recon) + (1.0 - x) * jnp.log(1.0 - recon))
    bce = bce.reshape(x.shape[0], -1).sum(axis=1)
    kl = -0.5 * jnp.sum(1.0 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    return jnp.mean(bce + beta * kl)
