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


def precise_bn_stats(module, params, batch_stats, loader, num_batches: int = 16, flax_momentum: float = None):
    """Recompute BN running stats over ``num_batches`` and return the new stats tree.

    Runs on the live training state each epoch before validation (ref
    sg_trainer.py:1552-1562) — per-batch statistics are recovered from the
    mutable-BN running-average update and averaged.
    """
    if not batch_stats:
        return batch_stats
    # flax momentum: infer from any BatchNorm default (our blocks use 1 - torch_mom)
    m = flax_momentum if flax_momentum is not None else 0.9

    @jax.jit
    def stats_pass(p, bs, images):
        _, mut = module.apply({"params": p, "batch_stats": bs}, images, train=True, mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(0)})
        return mut["batch_stats"]

    acc = None
    count = 0
    for bi, batch in enumerate(loader):
        if bi >= num_batches:
            break
        ra_i = stats_pass(params, batch_stats, jnp.asarray(batch[0]))
        batch_i = jax.tree_util.tree_map(lambda ra, ra0: (ra - m * ra0) / (1.0 - m), ra_i, batch_stats)
        acc = batch_i if acc is None else jax.tree_util.tree_map(jnp.add, acc, batch_i)
        count += 1
    if count == 0:
        return batch_stats
    precise = jax.tree_util.tree_map(lambda a: a / count, acc)
    logger.info(f"Precise BN: recomputed running stats over {count} batches")
    return precise


def compute_precise_bn_stats(model, loader, num_batches: int = 16, flax_momentum: float = None):
    """Recompute the model's BN running stats over ``num_batches`` and update it."""
    if not model.batch_stats:
        return model
    precise = precise_bn_stats(model.module, model.params, model.batch_stats, loader, num_batches, flax_momentum)
    variables = dict(model.variables)
    variables["batch_stats"] = precise
    model.update_variables(variables)
    return model
