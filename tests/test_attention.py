"""Flash-attention kernel vs the einsum reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from composable_diffusion_models_tpu.ops.attention import flash_attention


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("nq,nk,d", [(128, 128, 64), (256, 256, 32)])
def test_flash_matches_einsum(key, nq, nk, d):
    q = jax.random.normal(key, (2, 2, nq, d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, 2, nk, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, 2, nk, d))
    ref = flash_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_padded_keys_masked(key):
    # nk = 2 (the reference's label-context length): padded keys must not
    # contribute to the softmax
    q = jax.random.normal(key, (1, 2, 128, 32))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 2, 32))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 2, 32))
    ref = flash_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_multi_kblock(key):
    # nk spans several key blocks: exercises the online-softmax recurrence
    q = jax.random.normal(key, (1, 1, 128, 32))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 384, 32))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 384, 32))
    ref = flash_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, use_pallas=True, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)
