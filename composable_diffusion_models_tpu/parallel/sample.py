"""Expert-parallel sampling: the K composed experts sharded across devices.

The composition samplers' only cross-expert point is the eps blend
(compose.weighted). With the expert stack placed on an 'expert' mesh axis and
the sample batch on 'data', each device runs its local experts' forwards on
its batch shard and the blend becomes one weighted psum over ICI — the
sampler scans (samplers.py) consume the resulting eps_fn unchanged.

XLA's SPMD partitioner cannot split a vmapped conv's expert axis (it lowers
to feature groups — see parallel/train.py), so the expert axis is mapped
explicitly with shard_map, exactly like the expert-parallel train step.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def make_expert_parallel_eps_fn(apply_fn: Callable[..., Array], mesh: Mesh,
                                stacked_params: Any, weights: Array,
                                labels: Tuple[Array, ...] = ()):
    """Build ``eps_fn(x, t) -> weighted-combined eps`` with experts sharded.

    Args:
      apply_fn: per-expert model apply ``(params, x, t, *labels) -> eps``.
      mesh: mesh with ('expert', 'data') axes (data may be size 1).
      stacked_params: pytree stacked on a leading K axis; shard it on
        'expert' (mesh.shard_pytree_leading) before calling for real
        placement — the shard_map works either way.
      weights: (K,) blend weights (compose.weighted semantics: normalized by
        the global weight sum).
      labels: optional per-expert label arrays, each (K, B) (mapped over the
        expert axis with the params).

    Returns eps_fn usable by every sampler scan; x enters sharded on 'data'
    (or replicated), the result has the same sharding.
    """
    w_sum = jnp.sum(weights)

    def local(params, w, labs, x, t):
        # params/w/labs carry this device's expert shard; x is the local
        # batch shard; combine local experts then psum across the axis
        def one(p, wi, *ls):
            return wi * apply_fn(p, x, t, *ls)

        contrib = jax.vmap(one)(params, w, *labs).sum(axis=0)
        return jax.lax.psum(contrib, "expert") / w_sum

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("expert"), P("expert"), P("expert", "data"),
                  P("data"), P()),
        out_specs=P("data"),
        check_vma=False)

    def eps_fn(x: Array, t: Array) -> Array:
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = t[None]
        return fn(stacked_params, weights, labels, x, t)

    return eps_fn
