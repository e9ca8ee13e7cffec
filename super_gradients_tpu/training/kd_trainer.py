"""Knowledge distillation trainer.

Reference parity: ``training/kd_trainer/kd_trainer.py:36-355`` (KDTrainer builds
student + teacher + KDModule). Loss/module live in ``losses/kd_losses.py``.

Functional design: KDModule holds both nets as submodules; the teacher branch is
frozen via stop_gradient on its forward (zero grads -> zero updates with the
default momentum optimizers).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax

from super_gradients_tpu.models.sg_model import SgModel
from super_gradients_tpu.training.losses.kd_losses import KDLogitsLoss, KDModule, KDOutput  # noqa: F401
from super_gradients_tpu.training.trainer import Trainer


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
        # the frozen teacher must receive NO optimizer updates — stop_gradient only
        # zeroes grads, it does not stop weight decay (ref: teacher is never in the
        # optimizer's param groups, kd_trainer.py)
        tp.setdefault("frozen_param_patterns", ["teacher"])
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
