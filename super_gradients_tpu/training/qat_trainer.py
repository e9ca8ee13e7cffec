"""QAT/PTQ trainer flow.

Reference: ``Trainer.quantize_from_config`` (sg_trainer.py:2423+) +
``qat_trainer/qat_trainer.py:13``: PTQ-calibrate, then optionally QAT fine-tune with
a modified recipe (``modify_params_for_qat``), then evaluate.

Functional QAT here uses straight-through weight fake-quantization re-applied at
checkpoints: quantize → fine-tune at lr/10 → re-quantize, which matches the weight
error of an int8 engine (activation fake-quant calibration tables are produced by
``QuantizationCalibrator`` for downstream serving stacks).
"""

from __future__ import annotations

from typing import Dict, Optional

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.training.pre_launch_callbacks import modify_params_for_qat
from super_gradients_tpu.training.quantization import ptq
from super_gradients_tpu.training.trainer import Trainer

logger = get_logger(__name__)


class QATTrainer(Trainer):
    """ref qat_trainer.py:13."""

    def quantize(
        self,
        model,
        calib_loader,
        training_params: Optional[Dict] = None,
        train_loader=None,
        valid_loader=None,
        calibration_batches: int = 16,
        skip_modules=None,
        qat: bool = True,
    ):
        """PTQ (+ optional QAT fine-tune). Returns (model, calibration_table)."""
        model, table = ptq(model, calib_loader, calibration_batches, skip_modules=skip_modules)
        logger.info("PTQ complete (weights on int8 grid)")
        if qat and train_loader is not None and training_params:
            tp = modify_params_for_qat(training_params)
            logger.info(f"QAT fine-tune: lr={tp['initial_lr']}, epochs={tp['max_epochs']}")
            model = self.train(model, tp, train_loader, valid_loader)
            # land back on the int8 grid after fine-tuning
            model, _ = ptq(model, calibration_loader=None, skip_modules=skip_modules)
        return model, table

    @classmethod
    def quantize_from_config(cls, cfg: Dict):
        """ref sg_trainer.py:2423."""
        from super_gradients_tpu import models
        from super_gradients_tpu.training import dataloaders

        trainer = cls(cfg.get("experiment_name", "qat"), ckpt_root_dir=cfg.get("ckpt_root_dir"))
        model = models.get(
            cfg["architecture"],
            num_classes=cfg.get("num_classes"),
            arch_params=cfg.get("arch_params"),
            checkpoint_path=(cfg.get("checkpoint_params") or {}).get("checkpoint_path"),
        )
        dp = cfg.get("dataset_params") or {}
        train_loader = dataloaders.get(cfg.get("train_dataloader"), dataset_params=dp.get("train_dataset_params"))
        valid_loader = dataloaders.get(cfg.get("val_dataloader"), dataset_params=dp.get("val_dataset_params"))
        qp = cfg.get("quantization_params") or {}
        return trainer.quantize(
            model,
            calib_loader=train_loader,
            training_params=cfg.get("training_hyperparams"),
            train_loader=train_loader,
            valid_loader=valid_loader,
            calibration_batches=int(qp.get("calibration_batches", 16)),
            skip_modules=qp.get("skip_modules"),
            qat=bool(qp.get("qat", True)),
        )
