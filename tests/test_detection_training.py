"""Detection fine-tune e2e: YOLO-NAS-S tiny + PPYoloELoss on the 8-device CPU mesh
(driver config 5 analogue: 'YOLO-NAS-M fine-tune step: PPYoloELoss + TAL assigner,
EMA, multi-chip DP')."""

import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.training import dataloaders
from super_gradients_tpu.training.trainer import Trainer

# Heavy e2e training file — opt-in tier (pytest -m slow); the default tier keeps
# the per-component unit/golden tests (see pytest.ini).
pytestmark = pytest.mark.slow


def test_yolo_nas_detection_training_step(tmp_path):
    import super_gradients_tpu as sg

    sg.setup_device(num_devices=8)
    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    loader = dataloaders.DataLoader(
        dataloaders.RandomDetectionDataset(num_samples=16, image_size=(64, 64), num_classes=8, max_boxes=8),
        batch_size=16,
    )
    trainer = Trainer("det_e2e", ckpt_root_dir=str(tmp_path))
    params = dict(
        max_epochs=2,
        initial_lr=1e-4,
        loss="PPYoloELoss",
        criterion_params={"num_classes": 8},
        ema=True,
        optimizer="AdamW",
        optimizer_params={"weight_decay": 1e-4},
        valid_metrics_list=[],
        metric_to_watch="Loss",
        greater_metric_to_watch_is_better=False,
        average_best_models=False,
        zero_weight_decay_on_bias_and_bn=True,
    )
    trainer.train(model, params, loader, valid_loader=None)
    assert len(trainer.train_loss_history) == 2
    assert all(np.isfinite(x) for x in trainer.train_loss_history)
    # loss should decrease at lr 1e-4 over 2 epochs on a fixed tiny dataset
    assert trainer.train_loss_history[1] <= trainer.train_loss_history[0] * 1.5


def test_yolo_nas_static_assigner_training(tmp_path):
    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    loader = dataloaders.DataLoader(
        dataloaders.RandomDetectionDataset(num_samples=8, image_size=(64, 64), num_classes=8, max_boxes=8),
        batch_size=8,
    )
    trainer = Trainer("det_atss", ckpt_root_dir=str(tmp_path))
    params = dict(
        max_epochs=1,
        initial_lr=1e-4,
        loss="PPYoloELoss",
        criterion_params={"num_classes": 8, "use_static_assigner": True},
        valid_metrics_list=[],
        metric_to_watch="Loss",
        greater_metric_to_watch_is_better=False,
        save_model=False,
        average_best_models=False,
    )
    trainer.train(model, params, loader, valid_loader=None)
    assert np.isfinite(trainer.train_loss_history[0])
