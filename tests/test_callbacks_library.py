"""Callback library tests (ref training/utils/callbacks/callbacks.py:625-1433,
ppyoloe_switch_callback.py)."""

import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.training import dataloaders
from super_gradients_tpu.training.trainer import Trainer


def _det_loader(n=8, size=64, classes=8, bs=4):
    return dataloaders.DataLoader(
        dataloaders.RandomDetectionDataset(num_samples=n, image_size=(size, size), num_classes=classes, max_boxes=8),
        batch_size=bs,
    )


@pytest.mark.slow  # heavy e2e training — opt-in tier
def test_ppyoloe_stage_switch_rebuilds_criterion(tmp_path):
    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    loader = _det_loader()
    trainer = Trainer("cb_switch", ckpt_root_dir=str(tmp_path))
    params = dict(
        max_epochs=2, initial_lr=1e-4, loss="PPYoloELoss",
        criterion_params={"num_classes": 8, "use_static_assigner": True},
        valid_metrics_list=[], metric_to_watch="Loss", greater_metric_to_watch_is_better=False,
        save_model=False,
        phase_callbacks=[{"PPYoloETrainingStageSwitchCallback": {"static_assigner_end_epoch": 1}}],
    )
    trainer.train(model, params, loader, None)
    # after the switch the live criterion_params must reflect TAL
    assert trainer.training_params["criterion_params"]["use_static_assigner"] is False
    assert len(trainer.train_loss_history) == 2


def test_yolox_stage_switch_closes_mosaic(tmp_path):
    from super_gradients_tpu.training.callbacks import PhaseContext, YoloXTrainingStageSwitchCallback
    from super_gradients_tpu.training.transforms.detection import DetectionMixup, DetectionMosaic

    class DS:
        pass

    class Compose:
        pass

    ds = DS()
    compose = Compose()
    compose.transforms = [DetectionMosaic(input_dim=(64, 64), prob=1.0), DetectionMixup(prob=0.5)]
    ds.transforms = compose

    class Loader:
        dataset = ds

    cb = YoloXTrainingStageSwitchCallback(next_stage_start_epoch=3)
    ctx = PhaseContext(train_loader=Loader(), epoch=2)
    cb.on_train_loader_start(ctx)
    assert compose.transforms[0].prob == 1.0  # not yet
    ctx.epoch = 3
    cb.on_train_loader_start(ctx)
    assert compose.transforms[0].prob == 0.0 and compose.transforms[1].prob == 0.0
    assert ctx._criterion_updates == {"use_l1": True}


@pytest.mark.slow  # heavy e2e training — opt-in tier
def test_visualization_and_extreme_batch_callbacks(tmp_path):
    """Detection visualization + extreme-batch callbacks write images to the logger."""
    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    loader = _det_loader()
    trainer = Trainer("cb_vis", ckpt_root_dir=str(tmp_path))

    written = []

    class SpyLoggerCallback:  # capture via a real training run
        pass

    params = dict(
        max_epochs=1, initial_lr=1e-4, loss="PPYoloELoss", criterion_params={"num_classes": 8},
        valid_metrics_list=[], metric_to_watch="Loss", greater_metric_to_watch_is_better=False,
        save_model=False,
        phase_callbacks=[
            {"DetectionVisualizationCallback": {"max_images": 2}},
            {"ExtremeBatchDetectionVisualizationCallback": {"max_images": 2}},
        ],
    )
    trainer.train(model, params, loader, loader)
    # the base sg_logger writes images under the run dir; assert files exist
    import glob, os

    pngs = glob.glob(os.path.join(trainer.ckpt_dir, "**", "*.png"), recursive=True) + glob.glob(
        os.path.join(trainer.ckpt_dir, "**", "*.jpg"), recursive=True
    )
    assert pngs, f"no visualization images written under {trainer.ckpt_dir}"


def test_model_conversion_check_callback(tmp_path):
    from super_gradients_tpu.training.callbacks import ModelConversionCheckCallback, PhaseContext

    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    cb = ModelConversionCheckCallback(image_size=64, out_path=str(tmp_path / "check.stablehlo"))
    ctx = PhaseContext(model=model, experiment_name="convcheck")
    cb.on_training_start(ctx)  # must not raise
