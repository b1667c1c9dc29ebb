"""Pipeline parallelism: homogeneous stages across a 'stage' mesh axis.

GPipe-style microbatch pipeline as one jitted shard_map program: stage s
lives on device s (params stacked on the leading axis, sharded on 'stage'),
activations flow stage-to-stage via ``lax.ppermute`` over ICI, and the tick
loop is a ``lax.scan`` — M microbatches drain through S stages in M + S - 1
ticks with every device busy in the steady state.

The reference has no parallelism at all (SURVEY.md §2.8) and these UNets
don't need PP; this is framework surface for deep homogeneous towers (the
standard pipelined-transformer pattern). ``ppermute`` is differentiable, so
``jax.grad`` through :func:`make_pipeline_apply` yields pipeline-parallel
backprop without extra code.

Scope note: this is the straightforward fill-drain schedule (bubble fraction
(S-1)/(M+S-1)); 1F1B-style schedules reduce peak activation memory, not
bubble time, and are unnecessary at these sizes.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def stack_stage_params(params_list) -> Params:
    """Stack S same-structure stage param trees on a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params_list)


def make_pipeline_apply(stage_fn: Callable[[Params, jax.Array], jax.Array],
                        mesh: Mesh, n_stages: int, axis: str = "stage"):
    """Build ``fn(stacked_params, microbatches) -> outputs``.

    Args:
      stage_fn: one pipeline stage, ``(params, x) -> y`` with x and y of the
        SAME shape (homogeneous tower; e.g. a transformer/ResNet block).
      mesh: mesh containing ``axis`` of size ``n_stages``.
      n_stages: S; must equal the mesh axis size.

    The returned fn takes stacked stage params (leading dim S, shard on
    ``axis``) and microbatches of shape (M, mb, ...); it returns (M, mb, ...)
    outputs equal to applying the S stages sequentially to each microbatch.
    """
    s = mesh.shape[axis]
    assert s == n_stages, f"mesh axis {axis}={s} != n_stages={n_stages}"
    perm = [(j, (j + 1) % s) for j in range(s)]

    def local(stacked, microbatches):
        # stacked leaves arrive as (1, ...) — this device's stage params
        params = jax.tree_util.tree_map(lambda a: a[0], stacked)
        i = jax.lax.axis_index(axis)
        m = microbatches.shape[0]

        def tick(carry, t):
            x = carry
            inject = microbatches[jnp.clip(t, 0, m - 1)]
            x_in = jnp.where(i == 0, inject, x)
            y = stage_fn(params, x_in)
            # last stage's y is this tick's pipeline output; everyone else
            # contributes zeros, and the psum below replicates the result
            out = jnp.where(i == s - 1, y, jnp.zeros_like(y))
            y_next = jax.lax.ppermute(y, axis, perm)
            return y_next, out

        x0 = jnp.zeros_like(microbatches[0])
        _, outs = jax.lax.scan(tick, x0, jnp.arange(m + s - 1))
        outs = jax.lax.psum(outs, axis)
        # microbatch j exits the last stage at tick j + s - 1
        return outs[s - 1:]

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
        check_vma=False)
    return jax.jit(fn)


def shard_stage_params(stacked: Params, mesh: Mesh,
                       axis: str = "stage") -> Params:
    """Place stacked stage params with stage s on mesh position s."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
        stacked)
