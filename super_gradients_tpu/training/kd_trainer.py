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


def _first_metric_key(entry) -> str:
    """Resolve the results-dict key the first metric will report (its compute()
    output key), falling back to its registry/class name."""
    from super_gradients_tpu.training.metrics import get_metric

    try:
        m = get_metric(entry)
        keys = list(m.compute(m.init()).keys())
        if keys:
            return keys[0]
    except Exception:
        pass
    if isinstance(entry, str):
        return entry
    if isinstance(entry, dict):
        return next(iter(entry))
    return type(entry).__name__


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
        # the Trainer unwraps KDOutput.student_output for metrics (ref KDTrainer
        # validates the student) — default to student Accuracy instead of blind runs
        user_metrics = tp.get("valid_metrics_list")
        tp.setdefault("valid_metrics_list", ["Accuracy"])
        if "metric_to_watch" not in tp:
            # a caller-supplied metrics list may not contain Accuracy — watching a
            # key that never appears would break best-checkpoint tracking
            tp["metric_to_watch"] = _first_metric_key(user_metrics[0]) if user_metrics else "Accuracy"

        trained = super().train(kd_model, tp, train_loader, valid_loader, **kwargs)

        # hand back the trained student
        student_vars = {"params": trained.params["student"]}
        if trained.batch_stats and "student" in trained.batch_stats:
            student_vars["batch_stats"] = trained.batch_stats["student"]
        student.update_variables(jax.device_get(student_vars))
        return student

    @classmethod
    def train_from_config(cls, cfg: Dict):
        """KD recipe entry (ref kd_trainer.py:36-355): build student + teacher from
        their own architecture/arch_params/checkpoint_params sections, then
        distill. Accepts both the reference keying (student_architecture /
        teacher_architecture + *_checkpoint_params) and the kd_module recipe
        style (architecture: kd_module with arch_params.student/teacher +
        checkpoint_params.teacher_pretrained_weights)."""
        from super_gradients_tpu import models
        from super_gradients_tpu.training import dataloaders

        cfg = cls._trigger_cfg_modifying_callbacks(dict(cfg))
        ap = cfg.get("arch_params") or {}
        student_name = cfg.get("student_architecture") or ap.get("student") or ap.get("student_architecture")
        teacher_name = cfg.get("teacher_architecture") or ap.get("teacher") or ap.get("teacher_architecture")
        if not student_name or not teacher_name:
            raise ValueError("KD recipe needs student_architecture and teacher_architecture "
                             "(or arch_params.student/teacher)")
        nc = cfg.get("num_classes") or ap.get("num_classes")
        cp = cfg.get("checkpoint_params") or {}
        scp = cfg.get("student_checkpoint_params") or {}
        tcp = dict(cfg.get("teacher_checkpoint_params") or {})
        # kd_module-style keys fold into the teacher section
        tcp.setdefault("pretrained_weights", cp.get("teacher_pretrained_weights"))
        tcp.setdefault("checkpoint_path", cp.get("teacher_checkpoint_path"))

        student = models.get(
            student_name, num_classes=nc,
            arch_params=cfg.get("student_arch_params") or ap.get("student_arch_params"),
            pretrained_weights=scp.get("pretrained_weights") or cp.get("pretrained_weights"),
            checkpoint_path=scp.get("checkpoint_path"),
            load_backbone=bool(scp.get("load_backbone")),
            strict_load=scp.get("strict_load"),
        )
        teacher = models.get(
            teacher_name, num_classes=nc,
            arch_params=cfg.get("teacher_arch_params") or ap.get("teacher_arch_params"),
            pretrained_weights=tcp.get("pretrained_weights"),
            checkpoint_path=tcp.get("checkpoint_path"),
            load_backbone=bool(tcp.get("load_backbone")),
            strict_load=tcp.get("strict_load"),
        )
        if not tcp.get("pretrained_weights") and not tcp.get("checkpoint_path"):
            raise ValueError("KD teacher has no weights source (teacher_pretrained_weights / "
                             "teacher_checkpoint_path) — distilling from a random teacher "
                             "is almost certainly a recipe mistake (ref kd_trainer checks)")

        trainer = cls(experiment_name=cfg.get("experiment_name", "kd_experiment"), ckpt_root_dir=cfg.get("ckpt_root_dir"))
        trainer._recipe_cfg = cfg
        train_loader = dataloaders.get(
            cfg.get("train_dataloader"),
            dataset_params=(cfg.get("dataset_params") or {}).get("train_dataset_params"),
            dataloader_params=(cfg.get("dataset_params") or {}).get("train_dataloader_params"),
        )
        valid_loader = dataloaders.get(
            cfg.get("val_dataloader"),
            dataset_params=(cfg.get("dataset_params") or {}).get("val_dataset_params"),
            dataloader_params=(cfg.get("dataset_params") or {}).get("val_dataloader_params"),
        )
        trained_student = trainer.train(
            training_params=cfg.get("training_hyperparams") or {},
            train_loader=train_loader, valid_loader=valid_loader,
            student=student, teacher=teacher,
        )
        return trained_student, trainer
