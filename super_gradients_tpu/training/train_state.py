"""TrainState: the whole training world as one pytree.

Replaces the reference's mutable torch objects (net, EMA deepcopy, optimizer,
GradScaler — sg_trainer.py:442-766) with a single immutable pytree updated by the
jitted train step. EMA is just another branch (SURVEY §7 "EMA as pytree shadow").
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax.numpy as jnp


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # micro-step counter (int32 scalar)
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v

    @property
    def ema_variables(self):
        if self.ema_params is None:
            return self.variables
        v = {"params": self.ema_params}
        if self.ema_batch_stats:
            v["batch_stats"] = self.ema_batch_stats
        return v
