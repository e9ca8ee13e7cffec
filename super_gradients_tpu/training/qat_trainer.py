"""QAT/PTQ trainer flow.

Reference: ``Trainer.quantize_from_config`` (sg_trainer.py:2423+) +
``qat_trainer/qat_trainer.py:13``: PTQ-calibrate, then optionally QAT fine-tune with
a modified recipe (``modify_params_for_qat``), then evaluate.

Real QAT: the fine-tune runs with IN-GRAPH fake quantization — straight-through
weight fake-quant (per-channel int8, scales tracked from the live weights) plus
per-tensor activation fake-quant with the calibrated ranges, applied inside the
jitted train/eval steps (``quantization.make_qat_forward`` — the analogue of the
reference's pytorch-quantization TensorQuantizers on weights AND activations,
``selective_quantization_utils.py:50``). The final model is snapped to the int8
grid for serving.
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
        """PTQ (+ optional in-graph QAT fine-tune). Returns (model, calibration_table)."""
        from super_gradients_tpu.training.quantization import QuantizationCalibrator, fake_quantize_params

        # calibrate activation ranges BEFORE touching the weights
        table = None
        if calib_loader is not None:
            table = QuantizationCalibrator().calibrate_model(model, calib_loader, calibration_batches)
            logger.info(f"Calibrated {len(table.ranges)} activation tensors")

        if qat and train_loader is not None and training_params:
            tp = modify_params_for_qat(training_params)
            # the calibration table is CONSUMED by the forward: activations are
            # fake-quantized in-graph, weights via STE
            tp["qat_params"] = {
                "enabled": True,
                "calibration_table": table,
                "quantize_weights": True,
                "quantize_activations": table is not None,
                "skip_modules": list(skip_modules or []),
            }
            logger.info(f"QAT fine-tune (in-graph fake-quant): lr={tp['initial_lr']}, epochs={tp['max_epochs']}")
            model = self.train(model, tp, train_loader, valid_loader)
        # land on the int8 grid for the serving artifact
        variables = dict(model.variables)
        variables["params"] = fake_quantize_params(variables["params"], skip_modules)
        model.update_variables(variables)
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
