"""checkpoint_params plumbing through the recipe path + KD/eval CLIs.

Covers VERDICT r2 items #4/#6/#7: pretrained/teacher weights honored from
``checkpoint_params``, load_backbone subtree grafting, pre-launch callbacks
firing from train_from_config, KDTrainer.train_from_config, and
Trainer.evaluate_checkpoint.
"""

import json
import os

import jax
import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.common.registry import PRE_LAUNCH_CALLBACKS, register_pre_launch_callback
from super_gradients_tpu.training import dataloaders
from super_gradients_tpu.training.checkpoints import save_checkpoint
from super_gradients_tpu.training.kd_trainer import KDTrainer
from super_gradients_tpu.training.trainer import Trainer


def _leaf0(tree):
    return np.asarray(jax.tree_util.tree_leaves(tree)[0])


def _base_cls_cfg(tmp_path, **over):
    cfg = {
        "experiment_name": "ckpt_params_exp",
        "ckpt_root_dir": str(tmp_path),
        "architecture": "resnet18_cifar",
        "num_classes": 10,
        "train_dataloader": "classification_test_dataloader",
        "val_dataloader": "classification_test_dataloader",
        "dataset_params": {
            "train_dataset_params": {"batch_size": 8, "image_size": (32, 32), "dataset_size": 16},
            "val_dataset_params": {"batch_size": 8, "image_size": (32, 32), "dataset_size": 16},
        },
        "training_hyperparams": {
            "max_epochs": 1, "initial_lr": 0.01, "lr_mode": "CosineLRScheduler",
            "loss": "CrossEntropyLoss", "metric_to_watch": "Accuracy",
            "valid_metrics_list": ["Accuracy"],
        },
    }
    cfg.update(over)
    return cfg


def test_pre_launch_callback_fires_from_recipe(tmp_path):
    fired = {}

    @register_pre_launch_callback("_TestPreLaunch")
    class _TestPreLaunch:
        def __init__(self, **kw):
            pass

        def __call__(self, cfg, **_):
            fired["yes"] = True
            cfg["training_hyperparams"]["max_epochs"] = 1
            return cfg

    try:
        cfg = _base_cls_cfg(tmp_path, pre_launch_callbacks_list=[{"_TestPreLaunch": {}}])
        cfg["training_hyperparams"]["max_epochs"] = 3  # callback overrides to 1
        model, trainer = Trainer.train_from_config(cfg)
        assert fired.get("yes")
        assert len(trainer.train_loss_history) == 1  # callback-shortened run
    finally:
        PRE_LAUNCH_CALLBACKS.pop("_TestPreLaunch", None)


def test_checkpoint_params_pretrained_path_honored(tmp_path):
    """checkpoint_params.checkpoint_path (orbax dir) loads into the recipe model."""
    donor = models.get("resnet18_cifar", num_classes=10, seed=7)
    save_checkpoint(str(tmp_path), "donor_ckpt", {"variables": jax.device_get(donor.variables)})

    cfg = _base_cls_cfg(tmp_path)
    cfg["checkpoint_params"] = {"checkpoint_path": str(tmp_path / "donor_ckpt")}
    cfg["training_hyperparams"]["max_epochs"] = 0  # build-only is enough; but 0 epochs still runs validation
    built = Trainer._model_from_cfg(cfg)
    np.testing.assert_array_equal(_leaf0(built.params), _leaf0(donor.params))


def test_load_backbone_grafts_subtree(tmp_path):
    donor = models.get("yolo_nas_s", num_classes=5, seed=3)
    save_checkpoint(str(tmp_path), "donor_det", {"variables": jax.device_get(donor.variables)})

    loaded = models.get("yolo_nas_s", num_classes=5, seed=11,
                        checkpoint_path=str(tmp_path / "donor_det"), load_backbone=True)
    def _sig(tree):
        return float(sum(np.square(np.asarray(l)).sum() for l in jax.tree_util.tree_leaves(tree)))

    assert _sig(loaded.params["backbone"]) == pytest.approx(_sig(donor.params["backbone"]), rel=1e-6)
    # heads stay at their own (different-seed) init
    fresh = models.get("yolo_nas_s", num_classes=5, seed=11)
    assert _sig(loaded.params["heads"]) == pytest.approx(_sig(fresh.params["heads"]), rel=1e-6)
    assert _sig(loaded.params["heads"]) != pytest.approx(_sig(donor.params["heads"]), rel=1e-6)


def test_kd_recipe_loads_teacher_weights(tmp_path):
    """kd_module recipe: checkpoint_params.teacher_checkpoint_path must populate the
    teacher subtree (a random teacher would distill noise — VERDICT r2 Missing #6)."""
    teacher = models.get("lenet", num_classes=10, seed=5)
    save_checkpoint(str(tmp_path), "teacher_ckpt", {"variables": jax.device_get(teacher.variables)})

    cfg = _base_cls_cfg(
        tmp_path,
        architecture="kd_module",
        arch_params={"student": "lenet", "teacher": "lenet", "num_classes": 10},
        checkpoint_params={"teacher_checkpoint_path": str(tmp_path / "teacher_ckpt")},
    )
    cfg["dataset_params"]["train_dataset_params"]["image_size"] = (32, 32)
    model = Trainer._model_from_cfg(cfg)
    np.testing.assert_array_equal(_leaf0(model.params["teacher"]), _leaf0(teacher.params))


def test_kd_trainer_train_from_config(tmp_path):
    teacher = models.get("lenet", num_classes=10, seed=5)
    save_checkpoint(str(tmp_path), "teacher_ckpt", {"variables": jax.device_get(teacher.variables)})

    cfg = {
        "experiment_name": "kd_recipe_exp",
        "ckpt_root_dir": str(tmp_path),
        "student_architecture": "lenet",
        "teacher_architecture": "lenet",
        "num_classes": 10,
        "teacher_checkpoint_params": {"checkpoint_path": str(tmp_path / "teacher_ckpt")},
        "train_dataloader": "classification_test_dataloader",
        "val_dataloader": "classification_test_dataloader",
        "dataset_params": {
            "train_dataset_params": {"batch_size": 8, "image_size": (32, 32), "dataset_size": 16},
            "val_dataset_params": {"batch_size": 8, "image_size": (32, 32), "dataset_size": 16},
        },
        "training_hyperparams": {"max_epochs": 1, "initial_lr": 0.01, "lr_mode": "CosineLRScheduler"},
    }
    student, trainer = KDTrainer.train_from_config(cfg)
    # KD validation reports student Accuracy by default now
    assert any("Accuracy" in k for k in trainer.valid_metrics_history[-1])


def test_kd_trainer_requires_teacher_weights(tmp_path):
    cfg = {
        "student_architecture": "lenet", "teacher_architecture": "lenet", "num_classes": 10,
        "train_dataloader": "classification_test_dataloader",
        "val_dataloader": "classification_test_dataloader",
        "training_hyperparams": {"max_epochs": 1, "initial_lr": 0.01},
        "ckpt_root_dir": str(tmp_path),
    }
    with pytest.raises(ValueError, match="random teacher"):
        KDTrainer.train_from_config(cfg)


def test_evaluate_checkpoint_cli_path(tmp_path):
    cfg = _base_cls_cfg(tmp_path)
    model, trainer = Trainer.train_from_config(cfg)
    results = Trainer.evaluate_checkpoint(
        experiment_name="ckpt_params_exp", ckpt_root_dir=str(tmp_path), ckpt_name="ckpt_best")
    assert "Accuracy" in results
