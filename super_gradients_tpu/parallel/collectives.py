"""Collective helpers — XLA-collective analogues of the reference's NCCL wrappers.

Reference parity (``training/utils/distributed_training_utils.py``):
- ``distributed_all_reduce_tensor_average`` (:32)  → :func:`pmean`
- ``maybe_all_reduce_tensor_average``      (:380) → :func:`maybe_pmean`
- ``maybe_all_gather_as_list``             (:413) → :func:`all_gather_from_hosts`
- ``broadcast_from_master``  (``ddp_utils.py:157``) → :func:`broadcast_from_primary`

Inside jitted/shard_map code use ``jax.lax.pmean/psum`` directly — these helpers are
for *host-level* (outside-jit) coordination, which on TPU pods goes through
``jax.experimental.multihost_utils``.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np


def pmean(x, axis_name: str):
    """Mean over a mesh axis — use inside shard_map'd code."""
    return jax.lax.pmean(x, axis_name)


def psum(x, axis_name: str):
    return jax.lax.psum(x, axis_name)


def is_distributed() -> bool:
    return jax.process_count() > 1


def maybe_pmean_across_hosts(tree: Any) -> Any:
    """Average a host-local pytree of arrays across hosts (no-op single-host)."""
    if not is_distributed():
        return tree
    from jax.experimental import multihost_utils

    def _avg(x):
        g = multihost_utils.process_allgather(jnp.asarray(x))
        return np.mean(np.asarray(g), axis=0)

    return jax.tree_util.tree_map(_avg, tree)


def all_gather_from_hosts(x: Any) -> List[Any]:
    """Gather a host-local value from every host into a list (single-host: [x])."""
    if not is_distributed():
        return [x]
    from jax.experimental import multihost_utils

    g = multihost_utils.process_allgather(jnp.asarray(x))
    return list(np.asarray(g))

def broadcast_from_primary(x: Any) -> Any:
    """Broadcast a value from process 0 to all hosts (used for the graceful-stop flag,
    reference ``sg_trainer.py:1524``)."""
    if not is_distributed():
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(x)
