"""Divergence estimators for the Ito-kappa composition operator.

The reference pays a full forward+backward per expert per step through
torch.autograd (shapes/compose_images_ito.py:57-62, flagged "WARNING: slow").
On TPU we use forward-mode ``jax.jvp`` — one extra forward per probe, no
graph bookkeeping — exactly the original JAX notebook's formulation
(/root/reference/notebook/superposition_edu.py:130-134).

Probe conventions (both appear in the reference and are kept behind a flag):
  * rademacher — jax.random.randint*2-1 (notebook original)
  * gaussian   — torch.randn_like probes (shapes/compose_images_ito.py:58)
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _probe(key: Array, shape, dtype, kind: str) -> Array:
    if kind == "rademacher":
        return jax.random.randint(key, shape, 0, 2).astype(dtype) * 2.0 - 1.0
    if kind == "gaussian":
        return jax.random.normal(key, shape, dtype)
    raise ValueError(f"unknown probe kind: {kind!r}")


def value_and_div(fn: Callable[[Array], Array], x: Array, key: Array,
                  probe: str = "rademacher",
                  n_probes: int = 1) -> Tuple[Array, Array]:
    """Evaluate ``fn(x)`` and the Hutchinson estimate of div fn at x.

    ``fn`` maps (B, ...) -> (B, ...) (same shape). Returns
    (fn(x), div of shape (B,)). The estimate is
    E_v [ <v, J v> ] with v a probe vector; computed with forward-mode jvp so
    cost is ~one extra forward per probe.
    """
    axes = tuple(range(1, x.ndim))

    def single(k):
        v = _probe(k, x.shape, x.dtype, probe)
        val, jvp_val = jax.jvp(fn, (x,), (v,))
        return val, jnp.sum(jvp_val * v, axis=axes)

    if n_probes == 1:
        return single(key)
    keys = jax.random.split(key, n_probes)
    vals, divs = jax.vmap(single)(keys)
    return vals[0], jnp.mean(divs, axis=0)


def exact_div(fn: Callable[[Array], Array], x: Array) -> Tuple[Array, Array]:
    """Exact divergence via full Jacobian trace — for tests / tiny dims only.

    ``fn``: (B, D) -> (B, D). Returns (fn(x), trace of per-example Jacobian).
    """
    assert x.ndim == 2, "exact_div expects flat (B, D) inputs"
    d = x.shape[1]

    def one_dim(i):
        e = jnp.zeros_like(x).at[:, i].set(1.0)
        _, jvp_val = jax.jvp(fn, (x,), (e,))
        return jvp_val[:, i]

    traces = jax.vmap(one_dim)(jnp.arange(d))  # (D, B)
    return fn(x), jnp.sum(traces, axis=0)
