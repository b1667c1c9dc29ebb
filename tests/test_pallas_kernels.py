"""Pallas kernel correctness vs the XLA fallbacks (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from composable_diffusion_models_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _interpret_mode():
    # CPU backend: run the kernels in the Pallas interpreter
    with pltpu.force_tpu_interpret_mode():
        yield


def test_groupnorm_silu_matches_fallback(key):
    x = jax.random.normal(key, (2, 8, 8, 16))
    scale = jax.random.normal(jax.random.fold_in(key, 1), (16,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.fold_in(key, 2), (16,)) * 0.1
    ref = pk.groupnorm_silu(x, scale, bias, groups=4, use_pallas=False)
    out = pk.groupnorm_silu(x, scale, bias, groups=4, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_groupnorm_silu_matches_flax(key):
    import flax.linen as nn

    x = jax.random.normal(key, (2, 6, 6, 8))
    gn = nn.GroupNorm(num_groups=4)
    p = gn.init(key, x)
    ref = nn.silu(gn.apply(p, x))
    out = pk.groupnorm_silu(x, p["params"]["scale"], p["params"]["bias"],
                            groups=4, use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    out_k = pk.groupnorm_silu(x, p["params"]["scale"], p["params"]["bias"],
                              groups=4, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref), atol=1e-4)


def test_blend_eps_matches_weighted(key):
    from composable_diffusion_models_tpu import compose

    eps = jax.random.normal(key, (3, 2, 8, 8, 4))
    w = jnp.array([1.0, 2.0, 0.5])
    ref = compose.weighted(eps, w)
    out = pk.blend_eps(eps, w, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("shape", [(64, 32, 48), (130, 784, 2)])
def test_matmul_matches_xla(key, shape):
    m, k, n = shape
    a = jax.random.normal(key, (m, k))
    b = jax.random.normal(jax.random.fold_in(key, 1), (k, n))
    ref = a @ b
    out = pk.matmul(a, b, tile_m=128, tile_n=128, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_groupnorm_silu_split_matches_concat(key):
    from composable_diffusion_models_tpu.ops.pallas_kernels import (
        groupnorm_silu, groupnorm_silu_split)
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (3, 8, 8, 24))
    b = jax.random.normal(k2, (3, 8, 8, 8))
    scale = jax.random.normal(key, (32,)) * 0.1 + 1.0
    bias = jax.random.normal(key, (32,)) * 0.1
    ref = groupnorm_silu(jnp.concatenate([a, b], -1), scale, bias, groups=8,
                         use_pallas=False)
    pa, pb = groupnorm_silu_split([a, b], scale, bias, groups=8)
    got = jnp.concatenate([pa, pb], -1)
    assert jnp.allclose(ref, got, atol=1e-5), float(jnp.abs(ref - got).max())


def test_split_conv_matches_concat_conv(key):
    import flax.linen as nn
    from composable_diffusion_models_tpu.models.unet import _SplitConv
    k1, k2 = jax.random.split(key)
    a = jax.random.normal(k1, (2, 8, 8, 12))
    b = jax.random.normal(k2, (2, 8, 8, 4))
    sc = _SplitConv(6, (3, 3))
    p = sc.init(key, (a, b))
    ref = nn.Conv(6, (3, 3), padding="SAME").apply(p, jnp.concatenate([a, b], -1))
    got = sc.apply(p, (a, b))
    assert jnp.allclose(ref, got, atol=1e-5), float(jnp.abs(ref - got).max())

@pytest.mark.parametrize("b,t,d,h", [(8, 16, 64, 2),   # flagship-like 16-tok
                                     (6, 16, 32, 4),   # bb won't divide 128
                                     (4, 49, 32, 2),   # 49-token p4 layout
                                     (3, 8, 16, 1)])   # single head
def test_short_seq_attention_matches_fallback(key, b, t, d, h):
    qkv = jax.random.normal(key, (b, t, 3 * d), jnp.float32)
    ref = pk.short_seq_attention(qkv, h, use_pallas=False)
    out = pk.short_seq_attention(qkv, h, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_short_seq_attention_matches_mhdpa(key):
    """Against stock flax attention with transplanted params — pins the
    packed-QKV layout interpretation ([q|k|v] x [head] x [head_dim])."""
    import flax.linen as nn
    b, t, d, h = 4, 16, 64, 4
    x = jax.random.normal(key, (b, t, d))
    mh = nn.MultiHeadDotProductAttention(num_heads=h)
    p = mh.init(key, x, x)["params"]
    ref = mh.apply({"params": p}, x, x)
    w_qkv = jnp.concatenate(
        [p[k]["kernel"].reshape(d, -1) for k in ("query", "key", "value")], 1)
    b_qkv = jnp.concatenate(
        [p[k]["bias"].reshape(-1) for k in ("query", "key", "value")])
    o = pk.short_seq_attention(x @ w_qkv + b_qkv, h, use_pallas=True)
    got = o @ p["out"]["kernel"].reshape(d, d) + p["out"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_short_seq_attention_no_cross_image_leakage(key):
    """The packed block-diagonal mask must make image i's output depend on
    image i's tokens only: perturbing image 0 leaves images 1.. unchanged."""
    b, t, d, h = 8, 16, 32, 2
    qkv = jax.random.normal(key, (b, t, 3 * d), jnp.float32)
    out = pk.short_seq_attention(qkv, h, use_pallas=True)
    qkv2 = qkv.at[0].mul(-3.0)
    out2 = pk.short_seq_attention(qkv2, h, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out2[1:]), np.asarray(out[1:]),
                               rtol=1e-6, atol=1e-6)
    assert float(jnp.abs(out2[0] - out[0]).max()) > 1e-3


@pytest.mark.parametrize("b,t,d,h", [(8, 16, 64, 2),   # 1 attn chunk
                                     (4, 49, 32, 2),   # 2 uneven chunks
                                     (4, 64, 32, 2)])  # shapes-64 tokens
def test_fused_dit_block_matches_fallback(key, b, t, d, h):
    ks = jax.random.split(key, 9)
    tok = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    wq = jax.random.normal(ks[1], (d, 3 * d)) * 0.1
    bq = jax.random.normal(ks[2], (3 * d,)) * 0.1
    wp = jax.random.normal(ks[3], (d, d)) * 0.1
    bp_ = jax.random.normal(ks[4], (d,)) * 0.1
    w1 = jax.random.normal(ks[5], (d, 4 * d)) * 0.1
    b1 = jax.random.normal(ks[6], (4 * d,)) * 0.1
    w2 = jax.random.normal(ks[7], (4 * d, d)) * 0.1
    b2 = jax.random.normal(ks[8], (d,)) * 0.1
    ref = pk.fused_dit_block(tok, wq, bq, wp, bp_, w1, b1, w2, b2, h,
                             use_pallas=False)
    out = pk.fused_dit_block(tok, wq, bq, wp, bp_, w1, b1, w2, b2, h,
                             use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("b,t,d,h", [(8, 16, 64, 2),   # flagship-like T
                                     (8, 4, 64, 2)])   # p14-like tiny T
def test_fused_dit_block_batched_attn_matches_packed(key, b, t, d, h):
    """attn_mode='batched' (per-image dot_general batch dims, no mask) ==
    attn_mode='packed' == the XLA fallback — identical math, different
    MXU shapes (VERDICT r4 item 2a; the A/B lives in profile_dit.py)."""
    ks = jax.random.split(key, 9)
    tok = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    args = [jax.random.normal(k2, s) * 0.1 for k2, s in zip(
        ks[1:], [(d, 3 * d), (3 * d,), (d, d), (d,), (d, 4 * d), (4 * d,),
                 (4 * d, d), (d,)])]
    ref = pk.fused_dit_block(tok, *args, h, use_pallas=False)
    out = pk.fused_dit_block(tok, *args, h, use_pallas=True,
                             attn_mode="batched")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_folded_apply_fused_block_matches_module(key):
    """make_folded_apply(fused_block=True) == DiT.apply at batch-constant t
    (the TestFoldedDiT contract, through the whole-block kernel path)."""
    from composable_diffusion_models_tpu.models import DiT, make_folded_apply
    model = DiT(patch=4, dim=32, depth=2, n_heads=2, in_channels=1,
                qkv_fused=True)
    x = jax.random.normal(key, (4, 8, 8, 1), jnp.float32)
    t = jnp.full((1,), 0.37, jnp.float32)
    params = model.init(key, x, t)
    ref = model.apply(params, x, t)
    got = make_folded_apply(model, fused_block=True)(params, x, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
