"""KD losses + module wrapper (reference ``losses/kd_losses.py`` :10-60 and
``models/kd_modules/kd_module.py:18``). Lives under losses/ so registration happens
at package import (kd_trainer imports Trainer and would cycle)."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_kd_module, register_loss


class KDOutput(NamedTuple):
    student_output: Any
    teacher_output: Any


@register_kd_module("KDModule")
class KDModule(nn.Module):
    """ref kd_module.py:18 — run student and (frozen) teacher on the same input."""

    student: nn.Module
    teacher: nn.Module

    def __call__(self, x, train: bool = False):
        s = self.student(x, train=train)
        t = self.teacher(x, train=False)  # teacher always in eval mode
        t = jax.tree_util.tree_map(jax.lax.stop_gradient, t)
        return KDOutput(s, t)


@register_loss("KDLogitsLoss")
class KDLogitsLoss:
    """ref kd_losses.py:21 — task loss + distillation KL on logits."""

    def __init__(self, task_loss_fn=None, distillation_loss_coeff: float = 0.5, temperature: float = 1.0):
        from super_gradients_tpu.training.losses.classification_losses import CrossEntropyLoss

        if isinstance(task_loss_fn, str):
            from super_gradients_tpu.common.registry import LOSSES

            task_loss_fn = LOSSES[task_loss_fn]()
        self.task_loss = task_loss_fn or CrossEntropyLoss()
        self.coeff = distillation_loss_coeff
        self.temperature = temperature

    def __call__(self, outputs: KDOutput, targets) -> Tuple[jnp.ndarray, Dict]:
        s_logits, t_logits = outputs.student_output, outputs.teacher_output
        task, aux = self.task_loss(s_logits, targets)
        t = self.temperature
        # KLDiv(log_softmax(student/T), softmax(teacher/T)) (ref KDklDivLoss :10)
        s_logp = jax.nn.log_softmax(s_logits / t, axis=-1)
        t_p = jax.nn.softmax(t_logits / t, axis=-1)
        kd = jnp.mean(jnp.sum(t_p * (jnp.log(t_p + 1e-12) - s_logp), axis=-1)) * (t * t)
        loss = task * (1 - self.coeff) + kd * self.coeff
        return loss, {"task_loss": task, "distillation_loss": kd}
