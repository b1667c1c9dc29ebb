"""Tensor-parallel (model-axis) sharding of the UNet parameter tree.

SURVEY.md §2.8: the reference has no parallelism; DP and EP cover its
workloads, but the framework surface includes model sharding for wider nets.
The TPU-native mechanism is pure GSPMD: annotate each parameter's layout with
``NamedSharding`` and let XLA partition the convs/matmuls and insert the
collectives — no hand-written comms.

Layout rules (channels-last NHWC everywhere):
  * conv kernels  (kh, kw, cin, cout) -> shard cout on the model axis
  * dense kernels (cin, cout)         -> shard cout
  * biases / GN scale+bias (c,)       -> shard c
  * embedding tables (vocab, emb)     -> shard emb
Activations stay unsharded (batch is the data axis); XLA all-gathers the
channel shards where a following op consumes full channels (e.g. GroupNorm
stats) and keeps the wide convs' output-channel partitioning. For the
reference-scale nets (base 64) this is NOT a win — it exists so the same
code path scales to wide production nets; test_sharding pins numerics ==
unsharded.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def _spec_for(x: jax.Array, axis: str, axis_size: int) -> P:
    """Shard the trailing (output-channel/embedding) dim when it divides the
    mesh axis; replicate anything that doesn't fit the rule."""
    if x.ndim == 0:
        return P()
    if x.shape[-1] % axis_size != 0:
        return P()
    return P(*([None] * (x.ndim - 1)), axis)


def shard_unet_tp(params: Params, mesh: Mesh, axis: str = "model") -> Params:
    """Place a UNet (or any channels-last) param tree tensor-parallel.

    Returns the tree device_put with output-channel dims sharded over
    ``axis``; leaves whose trailing dim doesn't divide the axis size are
    replicated (e.g. the 1-or-3-channel output head kernel). Call under the
    mesh; jitted applies then run GSPMD-partitioned."""
    size = mesh.shape[axis]

    def place(x):
        return jax.device_put(x, NamedSharding(mesh, _spec_for(x, axis, size)))

    return jax.tree_util.tree_map(place, params)
