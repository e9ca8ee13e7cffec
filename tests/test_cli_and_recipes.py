"""CLI + recipe tests: recipe composition, train_from_recipe, evaluate."""

import numpy as np
import pytest


def test_builtin_recipes_load():
    from super_gradients_tpu.common.config import load_recipe

    for name in ["cifar10_resnet", "coco2017_yolo_nas_s", "cityscapes_stdc_seg50", "coco2017_yolo_nas_pose_s"]:
        cfg = load_recipe(name)
        assert "architecture" in cfg
        assert cfg["training_hyperparams"]["max_epochs"] > 0
        assert "metric_to_watch" in cfg["training_hyperparams"]


def test_train_from_recipe_cli(tmp_path):
    from super_gradients_tpu.train_from_recipe import main

    model, trainer = main([
        "--config-name", "cifar10_resnet",
        f"ckpt_root_dir={tmp_path}",
        "training_hyperparams.max_epochs=1",
        "dataset_params.train_dataset_params.dataset_size=32",
        "dataset_params.train_dataset_params.batch_size=16",
        "dataset_params.val_dataset_params.dataset_size=16",
        "dataset_params.val_dataset_params.batch_size=16",
        "training_hyperparams.lr_warmup_epochs=0",
    ])
    assert trainer.valid_metrics_history
    assert "Accuracy" in trainer.valid_metrics_history[-1]


def test_trainer_evaluate_standalone(tmp_path):
    from super_gradients_tpu import models
    from super_gradients_tpu.training import dataloaders
    from super_gradients_tpu.training.trainer import Trainer

    model = models.get("resnet18_cifar", num_classes=10)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    trainer = Trainer("eval_test", ckpt_root_dir=str(tmp_path))
    results = trainer.evaluate(model, loader, {"loss": "CrossEntropyLoss"}, metrics_list=["Accuracy", "Top5"])
    assert set(results) == {"Accuracy", "Top5", "Loss"}
    assert np.isfinite(results["Loss"])


def test_sg_logger_writes_events(tmp_path):
    from super_gradients_tpu.common.sg_loggers import get_sg_logger

    lg = get_sg_logger("base_sg_logger", experiment_name="t", checkpoints_dir_path=str(tmp_path), tensorboard=False)
    lg.add_config("cfg", {"a": 1})
    lg.add_scalar("loss", 1.5, 0)
    lg.close()
    events = (tmp_path / "events.jsonl").read_text().strip().splitlines()
    assert len(events) == 2
    import json

    assert json.loads(events[1])["value"] == 1.5


def test_system_monitor_samples():
    from super_gradients_tpu.common.monitoring import SystemMonitor

    class Sink:
        def __init__(self):
            self.rows = []

        def add_scalar(self, tag, value, step):
            self.rows.append((tag, value))

    mon = SystemMonitor(Sink())
    stats = mon.sample()
    assert "System/cpu_percent" in stats and "System/ram_percent" in stats
