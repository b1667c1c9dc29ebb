"""Device mesh + sharding helpers (SURVEY.md §2.8/§2.9 — new design, the
reference is single-device).

Axes:
  * ``data``   — batch-dim data parallelism (DP) for training and sampling.
  * ``expert`` — the K stacked expert networks placed across devices; the
    eps-blend at the composition point becomes an XLA collective over ICI.

Everything goes through ``jax.sharding.NamedSharding`` under ``jit``: we
annotate placements and let XLA insert psum/all_gather — no hand-written
collectives on the framework's main paths (Pallas ring patterns are reserved
for kernels, see ops/).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def make_mesh(axis_sizes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a named mesh. ``axis_sizes`` maps axis name -> size with at most
    one -1 (absorbs remaining devices). Default: all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = {"data": n}
    names = tuple(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    assert total <= n, f"mesh {axis_sizes} needs {total} devices, have {n}"
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def expert_sharding(mesh: Mesh, ndim: int = 1,
                    axis: str = "expert") -> NamedSharding:
    """Shard the leading (expert-stack) dim over ``axis``."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x: Array, mesh: Mesh, axis: str = "data") -> Array:
    return jax.device_put(x, data_sharding(mesh, x.ndim, axis))


def shard_pytree_leading(tree, mesh: Mesh, axis: str) -> "jax.tree_util.PyTreeDef":
    """Shard every leaf's leading dim over ``axis`` (e.g. stacked expert
    params over the 'expert' axis)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))), tree)


def replicate_pytree(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)


def initialize_distributed(**kwargs) -> None:
    """Multi-host entry (DCN): thin wrapper over jax.distributed.initialize.
    Single-process runs (tests, one v5e chip) never call this."""
    jax.distributed.initialize(**kwargs)
