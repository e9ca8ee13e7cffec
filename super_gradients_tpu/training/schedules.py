"""LR schedules as pure functions of the global step.

The reference mutates ``optimizer.param_groups`` from phase callbacks
(``utils/callbacks/callbacks.py:232-545``: LinearEpochLRWarmup :275,
LinearBatchLRWarmup :318, Step/Exp/Poly/Cosine/Function schedulers :395-545). On TPU
the schedule must live INSIDE the jitted train step, so every policy is compiled into
one ``schedule(step) -> lr`` function (optax-style), combining warmup → main → cooldown.
The math matches the reference exactly (e.g. CosineLRScheduler.compute_learning_rate,
callbacks.py:509-513).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.common.registry import register_lr_scheduler

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


@register_lr_scheduler("CosineLRScheduler")
def cosine_schedule(initial_lr: float, total_steps: int, cosine_final_lr_ratio: float = 0.01, **kw) -> Schedule:
    """ref callbacks.py:479-513."""

    def schedule(step):
        lr = 0.5 * initial_lr * (1.0 + jnp.cos(step / (total_steps + 1) * math.pi))
        return lr * (1 - cosine_final_lr_ratio) + initial_lr * cosine_final_lr_ratio

    return schedule


@register_lr_scheduler("StepLRScheduler")
def step_schedule(
    initial_lr: float,
    steps_per_epoch: int,
    lr_updates: Sequence[int] = (),
    lr_decay_factor: float = 0.1,
    step_lr_update_freq: float = None,
    max_epochs: int = 1,
    lr_warmup_epochs: int = 0,
    **kw,
) -> Schedule:
    """Decay by ``lr_decay_factor`` at each epoch in ``lr_updates`` (ref StepLRScheduler).

    ``step_lr_update_freq`` (mutually exclusive with ``lr_updates``) generates a
    decay every ``freq`` epochs, skipping warmup epochs — ref
    callbacks.py:400-416 StepLRCallback."""
    if step_lr_update_freq:
        if len(lr_updates):
            raise ValueError("Parameters lr_updates and step_lr_update_freq are mutually exclusive")
        lr_updates = [
            int(math.ceil(step_lr_update_freq * x))
            for x in range(1, max_epochs)
            if lr_warmup_epochs <= int(math.ceil(step_lr_update_freq * x)) < max_epochs
        ]
    boundaries = jnp.asarray([u * steps_per_epoch for u in sorted(lr_updates)], dtype=jnp.float32)

    def schedule(step):
        n = jnp.sum(step >= boundaries) if boundaries.size else 0
        return initial_lr * (lr_decay_factor ** n)

    return schedule


@register_lr_scheduler("PolyLRScheduler")
def poly_schedule(initial_lr: float, total_steps: int, power: float = 0.9, **kw) -> Schedule:
    """ref PolyLRScheduler: lr = initial * (1 - step/total)^0.9."""

    def schedule(step):
        frac = jnp.clip(step / jnp.maximum(total_steps, 1), 0.0, 1.0)
        return initial_lr * (1.0 - frac) ** power

    return schedule


@register_lr_scheduler("ExponentialLRScheduler")
def exponential_schedule(initial_lr: float, steps_per_epoch: int, lr_decay_factor: float = 0.9, **kw) -> Schedule:
    """Per-epoch exponential decay (ref ExponentialLRScheduler)."""

    def schedule(step):
        epoch = jnp.floor(step / steps_per_epoch)
        return initial_lr * (lr_decay_factor ** epoch)

    return schedule


@register_lr_scheduler("FunctionLRScheduler")
def function_schedule(initial_lr: float, total_steps: int, steps_per_epoch: int, lr_schedule_function=None, max_epochs: int = 1, **kw) -> Schedule:
    """User-supplied ``f(initial_lr, epoch, max_epochs) -> lr`` evaluated per step."""
    if lr_schedule_function is None:
        raise ValueError("FunctionLRScheduler requires lr_schedule_function")
    table = np.asarray([lr_schedule_function(initial_lr, e, max_epochs) for e in range(max_epochs)], dtype=np.float32)
    table_j = jnp.asarray(table)

    def schedule(step):
        epoch = jnp.clip((step // steps_per_epoch).astype(jnp.int32), 0, max_epochs - 1)
        return table_j[epoch]

    return schedule


def build_lr_schedule(
    lr_mode: Optional[str],
    initial_lr: float,
    max_epochs: int,
    steps_per_epoch: int,
    lr_warmup_epochs: int = 0,
    lr_warmup_steps: int = 0,
    warmup_initial_lr: Optional[float] = None,
    lr_cooldown_epochs: int = 0,
    warmup_mode: str = "LinearEpochLRWarmup",
    **scheduler_kwargs,
) -> Schedule:
    """Compose warmup → scheduler → cooldown into a single step→lr function.

    Semantics mirror the reference trainer (sg_trainer.py:1336-1412 +
    callbacks.py:489-506): warmup covers the first ``lr_warmup_epochs`` epochs (or
    ``lr_warmup_steps`` steps); the main scheduler sees "effective" steps with
    warmup/cooldown removed; cooldown holds the final scheduler value.
    """
    warmup_steps = int(lr_warmup_steps or lr_warmup_epochs * steps_per_epoch)
    cooldown_steps = int(lr_cooldown_epochs * steps_per_epoch)
    total_steps = max_epochs * steps_per_epoch
    effective_total = max(total_steps - warmup_steps - cooldown_steps, 1)

    if warmup_initial_lr is None:
        warmup_initial_lr = initial_lr / (lr_warmup_epochs + 1) if lr_warmup_epochs > 0 else 0.0

    if lr_mode is None:
        main: Schedule = lambda step: jnp.asarray(initial_lr)
    else:
        from super_gradients_tpu.common.registry import LR_SCHEDULERS

        # legacy lr_mode names (ref sg_trainer deprecation shim: "cosine" etc. in
        # pre-3.x recipes map onto the *LRScheduler registry entries)
        _LEGACY = {
            "cosine": "CosineLRScheduler",
            "step": "StepLRScheduler",
            "poly": "PolyLRScheduler",
            "exp": "ExponentialLRScheduler",
            "function": "FunctionLRScheduler",
        }
        lr_mode = _LEGACY.get(lr_mode, lr_mode)
        if lr_mode not in LR_SCHEDULERS:
            raise KeyError(f"Unknown lr_mode `{lr_mode}`; registered: {sorted(LR_SCHEDULERS)}")
        main = LR_SCHEDULERS[lr_mode](
            initial_lr=initial_lr,
            total_steps=effective_total,
            steps_per_epoch=steps_per_epoch,
            max_epochs=max_epochs,
            lr_warmup_epochs=lr_warmup_epochs,
            **scheduler_kwargs,
        )

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if warmup_mode == "LinearBatchLRWarmup" or lr_warmup_steps > 0:
            warm_lr = warmup_initial_lr + (initial_lr - warmup_initial_lr) * step / jnp.maximum(warmup_steps, 1)
        else:  # LinearEpochLRWarmup: start at exactly warmup_initial_lr at epoch 0 and
            # climb in steps of (initial - warmup_initial)/lr_warmup_epochs, reaching
            # initial_lr at epoch == lr_warmup_epochs (ref callbacks.py:275 LinearEpochLRWarmup)
            epoch = jnp.floor(step / steps_per_epoch)
            warm_lr = warmup_initial_lr + (initial_lr - warmup_initial_lr) * epoch / jnp.maximum(
                lr_warmup_epochs, 1
            )
        eff = jnp.clip(step - warmup_steps, 0, effective_total)
        main_lr = main(eff)
        lr = jnp.where(step < warmup_steps, warm_lr, main_lr)
        return lr

    return schedule
