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


def all_gather_variable_length(arrays: dict) -> dict:
    """All-gather a dict of per-process arrays whose LEADING dimension differs
    across processes (host metric states — ref DetectionMetrics DDP gather /
    accumulate_on_cpu). Arrays are padded to the global max length, gathered with
    ``process_allgather``, and re-concatenated with padding stripped.

    Single-process: returns the arrays unchanged.
    """
    if not is_distributed():
        return dict(arrays)
    from jax.experimental import multihost_utils

    keys = sorted(arrays)
    n_local = len(next(iter(arrays.values()))) if arrays else 0
    lengths = np.asarray(multihost_utils.process_allgather(jnp.asarray([n_local], jnp.int32))).reshape(-1)
    n_max = int(lengths.max())
    out = {}
    for k in keys:
        a = np.asarray(arrays[k])
        pad_width = [(0, n_max - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        padded = np.pad(a, pad_width)
        g = np.asarray(multihost_utils.process_allgather(jnp.asarray(padded)))  # [P, n_max, ...]
        out[k] = np.concatenate([g[p, : lengths[p]] for p in range(g.shape[0])], axis=0)
    return out
