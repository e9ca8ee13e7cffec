"""Model EMA as a pure pytree shadow inside the train state.

Reference parity: ``training/utils/ema.py:27`` (ModelEMA) +
``ema_decay_schedules.py:7-83`` (constant/threshold/exp). The torch version
deep-copies the network; here the EMA params are just another branch of the
TrainState pytree, updated inside the jitted train step — zero host sync.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

DecayFn = Callable[[jnp.ndarray], jnp.ndarray]  # step -> decay


def make_decay_fn(decay: float = 0.9999, decay_type: str = "exp", beta: float = 15.0, total_steps: int = 1) -> DecayFn:
    """ref ema_decay_schedules.py: constant | threshold | exp."""
    if decay_type == "constant":
        return lambda step: jnp.asarray(decay)
    if decay_type == "threshold":
        return lambda step: jnp.minimum(decay, (1.0 + step) / (10.0 + step))
    if decay_type == "exp":
        return lambda step: decay * (1.0 - jnp.exp(-(step / total_steps) * beta))
    raise ValueError(f"Unknown EMA decay_type `{decay_type}` (constant|threshold|exp)")


def ema_update(ema_tree, new_tree, decay):
    """ema = decay * ema + (1 - decay) * new (jittable)."""
    return jax.tree_util.tree_map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_tree, new_tree)
