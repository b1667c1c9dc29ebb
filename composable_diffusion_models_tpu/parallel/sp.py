"""Sequence/context parallelism: ring attention over a sharded token axis.

SURVEY.md §5.7: the reference's attention is HW image tokens vs a <=2-token
label context — no sequence scaling anywhere. This module is the capability
headroom that stance calls for: shard the TOKEN axis of (B, H, N, D)
attention across a 'seq' mesh axis and compute exact softmax attention with
K/V shards rotating around the ring via ``lax.ppermute``, merging each hop
into a running online-softmax (max, denom, acc) state — the same recurrence
as the Pallas flash kernel (ops/attention.py), lifted one level: blocks
stream around the ICI ring instead of through VMEM.

Memory per device is O(N/S x D); no device ever materializes the full
(N x N) logits or the full K/V. ``ppermute`` is differentiable, so the ring
works under ``jax.grad`` as well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def make_ring_attention(mesh: Mesh, axis: str = "seq",
                        scale: float | None = None):
    """Build ``fn(q, k, v) -> out`` with the token axis sharded on ``axis``.

    q, k, v: (B, H, N, D) with N sharded over the mesh axis (queries stay
    local; K/V shards take S-1 hops around the ring). Output is (B, H, N, D)
    with the same sharding as q. Exact math — tests pin equality with the
    single-device softmax reference.
    """
    s = mesh.shape[axis]
    perm = [(j, (j + 1) % s) for j in range(s)]

    def local(q, k, v):
        sc = scale if scale is not None else 1.0 / (q.shape[-1] ** 0.5)
        qf = q.astype(jnp.float32) * sc

        def hop(carry, _):
            m, l, acc, k_cur, v_cur = carry
            logits = jnp.einsum("bhqd,bhkd->bhqk", qf,
                                k_cur.astype(jnp.float32))
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, m_cur)
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p,
                                           v_cur.astype(jnp.float32))
            k_next = jax.lax.ppermute(k_cur, axis, perm)
            v_next = jax.lax.ppermute(v_cur, axis, perm)
            return (m_new, l, acc, k_next, v_next), None

        b, h, nq, d = q.shape
        m0 = jnp.full((b, h, nq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, nq, 1), jnp.float32)
        acc0 = jnp.zeros((b, h, nq, d), jnp.float32)
        (m, l, acc, _, _), _ = jax.lax.scan(
            hop, (m0, l0, acc0, k, v), None, length=s)
        return (acc / l).astype(q.dtype)

    spec = P(None, None, axis, None)
    fn = jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return jax.jit(fn)
