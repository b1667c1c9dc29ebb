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


def test_flash_uneven_multiblock_keys(key):
    # nk = 200 with block_k = 128: pads to 256 (two key blocks, 56 padded
    # rows in the LAST block) — the exact edge the bias-feature masking
    # must survive (VERDICT r1 weak-4)
    q = jax.random.normal(key, (1, 2, 128, 32))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 200, 32))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 200, 32))
    ref = flash_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, use_pallas=True, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_flash_long_context(key):
    # long-context shape (SURVEY §5.7 headroom): 4096 query tokens (a 64x64
    # image's HW) x 4096 keys; interpret mode on CPU, so batch/heads/d small
    q = jax.random.normal(key, (1, 1, 4096, 64))
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 1, 4096, 64))
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 1, 4096, 64))
    ref = flash_attention(q, k, v, use_pallas=False)
    out = flash_attention(q, k, v, use_pallas=True,
                          block_q=256, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_unet_flash_attn_flag_matches_einsum(key):
    """UNet(cross_attn=True, flash_attn=True) is reachable from the model
    path and numerically matches the einsum attention on the same params."""
    from composable_diffusion_models_tpu.models import UNet

    kw = dict(in_channels=3, base_dim=8, channel_mults=(1, 2),
              num_classes=(3, 3), cross_attn=True)
    m_ein = UNet(**kw)
    m_fla = UNet(**kw, flash_attn=True)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.ones((2,))
    labs = (jnp.zeros((2,), jnp.int32), jnp.ones((2,), jnp.int32))
    params = m_ein.init(key, x, t, *labs)
    ref = m_ein.apply(params, x, t, *labs)
    out = m_fla.apply(params, x, t, *labs)  # same param tree by construction
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-3)
