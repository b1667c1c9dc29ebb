"""Flash-style blockwise attention kernel (Pallas, TPU).

The reference's cross-attention runs H*W query tokens against a 1-2-token
label context (src/compositional_diffusion_with_cross_attention.py:86-141) —
tiny KV, for which the UNet uses two fused einsums. This kernel is the
capability headroom called for in SURVEY.md §5.7: the same block-sequence
layout scales to long contexts / larger images, with the online-softmax
running (max, denom, acc) state so K/V stream through VMEM block by block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import use_pallas_default

Array = jax.Array

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, bk: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale            # (bq, d)
    nk, d = k_ref.shape[1], k_ref.shape[2]
    bq = q.shape[0]
    n_kblocks = nk // bk

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * bk, bk), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # (bq, bk)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk,
                                    preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    _, l_fin, acc = jax.lax.fori_loop(0, n_kblocks, body, (m0, l0, acc0))
    out_ref[0] = (acc / l_fin).astype(out_ref.dtype)


def flash_attention(q: Array, k: Array, v: Array, scale: float | None = None,
                    block_q: int = 128, block_k: int = 128,
                    use_pallas: bool | None = None) -> Array:
    """softmax(q k^T * scale) v over (B, H, N, D) tensors.

    Blockwise flash attention with the online-softmax running (max, denom,
    acc) state: K/V stream through VMEM ``block_k`` rows at a time, so memory
    is O(block) instead of O(N_q x N_k). ``use_pallas=False`` (or a non-TPU
    backend) falls back to the two-einsum reference implementation, which is
    also the numerical oracle in tests/test_attention.py.

    Shape handling: N_q, N_k and D are zero-padded up to block multiples.
    Padded QUERY rows and feature columns are harmless (sliced off / zero
    contributions); padded KEY rows would receive softmax weight, so they are
    masked via a bias feature: one extra column where every real query holds
    1 and every padded key row holds -inf/scale — their logit contribution
    becomes ~-1e30 * scale and the padded keys vanish from the softmax.
    Correctness of this trick at ``nk % block_k != 0`` (both nk < block_k and
    multi-block nk) is pinned by tests/test_attention.py.
    """
    if use_pallas is None:
        use_pallas = use_pallas_default()
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    if not use_pallas:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * scale
        attn = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", attn,
                          v.astype(jnp.float32)).astype(q.dtype)

    b, h, nq, d = q.shape
    nk = k.shape[2]

    def rup(x, m):
        return -(-x // m) * m

    nq_p, nk_p, d_p = rup(nq, block_q), rup(nk, block_k), rup(d, 128)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, d_p - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, nk_p - nk), (0, d_p - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk_p - nk), (0, d_p - d)))
    # mask padded keys: give them a huge negative contribution by poisoning
    # the first feature dim of padded K rows (q.k^T becomes very negative
    # only if q has positive first feature — instead mask via value trick is
    # unsafe; do it properly with a length-aware bias folded into K):
    if nk_p != nk:
        # append a bias feature: q gets +1 column, padded K rows get -inf
        ones = jnp.ones((b, h, nq_p, 1), qp.dtype)
        qp = jnp.concatenate([qp, ones], axis=-1)
        bias_col = jnp.zeros((b, h, nk_p, 1), kp.dtype)
        bias_col = bias_col.at[:, :, nk:, :].set(_NEG_INF * scale)
        kp = jnp.concatenate([kp, bias_col / scale], axis=-1)
        d_p = d_p + 1
        d_pad = rup(d_p, 128) - d_p
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, 0), (0, d_pad)))
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, 0), (0, d_pad)))
        d_p += d_pad
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, 0), (0, d_p - vp.shape[-1])))

    qf = qp.reshape(b * h, nq_p, d_p)
    kf = kp.reshape(b * h, nk_p, d_p)
    vf = vp.reshape(b * h, nk_p, d_p)
    kernel = functools.partial(_flash_kernel, bk=block_k, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, nq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, d_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, d_p), q.dtype),
    )(qf, kf, vf)
    return out.reshape(b, h, nq_p, d_p)[:, :, :nq, :d]
