"""Tensor (model) parallelism over the mesh's ``model`` axis.

The reference has no tensor-parallel path (its DDP is pure data-parallel,
``distributed_training_utils.py``); this is the TPU-native extra: shard the
output-channel dimension of every large conv/dense kernel over the ``model``
mesh axis with `jax.sharding.NamedSharding`, and let GSPMD place the
collectives. No module surgery — the SAME flax module runs tp, dp or both,
depending only on how its param arrays are placed.

How it maps to hardware: a conv kernel ``[H, W, I, O]`` sharded on ``O``
makes each device compute a channel slice of every activation; XLA inserts
an all-gather only where a downstream op needs the full channel dim (or
keeps the slice when the consumer is also sharded — the Megatron
column-then-row pattern falls out of propagation for stacked convs/denses).
Biases and BN vectors ``[O]`` shard the same way, so elementwise follow-ups
stay local. Small kernels stay replicated: gathering a 3x3x16x16 kernel
costs more than recomputing with it.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from super_gradients_tpu.parallel.mesh import MODEL_AXIS, get_mesh

__all__ = ["tensor_parallel_shardings", "shard_params_tp", "tp_axis_size"]

# shard a kernel only when every device gets at least this many output channels;
# below it the all-gather latency dominates any FLOP win
_MIN_CHANNELS_PER_DEVICE = 8


def tp_axis_size(mesh: Optional[Mesh] = None) -> int:
    mesh = mesh or get_mesh()
    return mesh.shape[MODEL_AXIS]


def _spec_for(path_leaf_name: str, shape, tp: int):
    """PartitionSpec sharding the trailing (output-channel) dim, or None to replicate.

    Conv kernels are HWIO, dense kernels IO, biases/BN scale-bias [O] — in every
    case the LAST dim is the output-channel dim, so one rule covers them all.
    """
    if not shape:
        return None
    out_ch = shape[-1]
    if out_ch % tp != 0 or out_ch // tp < _MIN_CHANNELS_PER_DEVICE:
        return None
    # batch_stats vectors ([O]) and params alike: shard trailing dim only
    return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))


def tensor_parallel_shardings(variables, mesh: Optional[Mesh] = None):
    """A pytree of `NamedSharding`s matching ``variables``: output-channel dims
    sharded over the ``model`` axis where divisible and large enough, everything
    else replicated. Feed to ``jax.jit(in_shardings=...)`` or ``jax.device_put``."""
    mesh = mesh or get_mesh()
    tp = tp_axis_size(mesh)

    def leaf_sharding(leaf):
        shape = np.shape(leaf)
        spec = _spec_for("", shape, tp) if tp > 1 else None
        return NamedSharding(mesh, spec if spec is not None else P())

    return jax.tree_util.tree_map(leaf_sharding, variables)


def shard_params_tp(variables, mesh: Optional[Mesh] = None):
    """Place ``variables`` on the mesh tensor-parallel (see
    ``tensor_parallel_shardings``). Returns the same pytree with every leaf a
    sharded `jax.Array`; pass it to ``module.apply`` unchanged."""
    shardings = tensor_parallel_shardings(variables, mesh)
    return jax.tree_util.tree_map(jax.device_put, variables, shardings)
