"""Precise BatchNorm statistics recomputation.

Reference: ``distributed_training_utils.py:99-147`` (``compute_precise_bn_stats``):
after training, replace BN running stats with the true average of per-batch
statistics over N batches (all-reduced across devices — free here because a jitted
forward over mesh-sharded batches computes GLOBAL batch statistics already).

Per-batch statistics are recovered from the mutable-BN update:
``ra_i = m * ra0 + (1 - m) * batch_i``  ⇒  ``batch_i = (ra_i - m * ra0) / (1 - m)``
with flax momentum m, so no module changes are needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)


def compute_precise_bn_stats(model, loader, num_batches: int = 16, flax_momentum: float = None):
    """Recompute the model's BN running stats over ``num_batches`` and update it."""
    if not model.batch_stats:
        return model
    base_stats = model.batch_stats
    params = model.params
    module = model.module

    # flax momentum: infer from any BatchNorm default (our blocks use 1 - torch_mom)
    m = flax_momentum if flax_momentum is not None else 0.9

    @jax.jit
    def stats_pass(images):
        _, mut = module.apply({"params": params, "batch_stats": base_stats}, images, train=True, mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(0)})
        return mut["batch_stats"]

    acc = None
    count = 0
    for bi, batch in enumerate(loader):
        if bi >= num_batches:
            break
        ra_i = stats_pass(jnp.asarray(batch[0]))
        batch_i = jax.tree_util.tree_map(lambda ra, ra0: (ra - m * ra0) / (1.0 - m), ra_i, base_stats)
        acc = batch_i if acc is None else jax.tree_util.tree_map(jnp.add, acc, batch_i)
        count += 1
    if count == 0:
        return model
    precise = jax.tree_util.tree_map(lambda a: a / count, acc)
    variables = dict(model.variables)
    variables["batch_stats"] = precise
    model.update_variables(variables)
    logger.info(f"Precise BN: recomputed running stats over {count} batches")
    return model
