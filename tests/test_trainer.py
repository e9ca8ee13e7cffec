"""End-to-end trainer tests on fake data (reference strategy:
tests/end_to_end_tests/trainer_test.py — short trainings on library test loaders,
assert on metrics/checkpoint files)."""

import os

import jax
import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.training import dataloaders
from super_gradients_tpu.training.trainer import Trainer


def _quick_params(**over):
    p = dict(
        max_epochs=2,
        initial_lr=0.05,
        loss="CrossEntropyLoss",
        optimizer="SGD",
        optimizer_params={"momentum": 0.9},
        valid_metrics_list=["Accuracy", "Top5"],
        metric_to_watch="Accuracy",
        average_best_models=False,
        sg_logger_params={},
    )
    p.update(over)
    return p


def test_classification_training_learns(tmp_path):
    """Train tiny resnet on a learnable fake task: loss must drop, ckpts written."""
    model = models.get("resnet18_cifar", num_classes=3)
    # learnable task: the label's channel is brightened — trivially separable
    ds = dataloaders.RandomClassificationDataset(num_samples=64, image_size=(32, 32), num_classes=3)
    for i in range(len(ds)):
        ds._images[i, :, :, ds._labels[i]] += 1.0
    loader = dataloaders.DataLoader(ds, batch_size=16, shuffle=True)

    trainer = Trainer("e2e_cls", ckpt_root_dir=str(tmp_path))
    params = _quick_params(max_epochs=6, initial_lr=0.01, zero_weight_decay_on_bias_and_bn=True,
                           optimizer_params={"momentum": 0.9, "weight_decay": 1e-4})
    model = trainer.train(model, params, loader, loader)

    assert trainer.train_loss_history[-1] < trainer.train_loss_history[0]
    assert trainer.valid_metrics_history[-1]["Accuracy"] > 0.5
    assert os.path.isdir(os.path.join(trainer.ckpt_dir, "ckpt_latest"))
    assert os.path.isdir(os.path.join(trainer.ckpt_dir, "ckpt_best"))


def test_training_with_ema_and_cosine(tmp_path):
    model = models.get("resnet18_cifar", num_classes=10)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    trainer = Trainer("e2e_ema", ckpt_root_dir=str(tmp_path))
    params = _quick_params(
        max_epochs=2,
        ema=True,
        ema_params={"decay": 0.99, "decay_type": "threshold"},
        lr_mode="CosineLRScheduler",
        cosine_final_lr_ratio=0.1,
        lr_warmup_epochs=1,
    )
    trainer.train(model, params, loader, loader)
    assert len(trainer.valid_metrics_history) == 2


def test_resume_training(tmp_path):
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    m1 = models.get("resnet18_cifar", num_classes=10)
    t1 = Trainer("e2e_resume", ckpt_root_dir=str(tmp_path))
    t1.train(m1, _quick_params(max_epochs=2), loader, loader)
    step_after_2 = int(t1.train_state.step)

    m2 = models.get("resnet18_cifar", num_classes=10)
    t2 = Trainer("e2e_resume", ckpt_root_dir=str(tmp_path))
    t2.train(m2, _quick_params(max_epochs=4, resume=True), loader, loader)
    # resumed from epoch 2 → only 2 more epochs of steps
    assert int(t2.train_state.step) == step_after_2 * 2


def test_grad_accumulation_and_clipping(tmp_path):
    model = models.get("resnet18_cifar", num_classes=10)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 8})
    trainer = Trainer("e2e_accum", ckpt_root_dir=str(tmp_path))
    trainer.train(model, _quick_params(max_epochs=1, batch_accumulate=2, clip_grad_norm=1.0), loader, loader)
    assert trainer.train_loss_history


def test_early_stop_callback(tmp_path):
    from super_gradients_tpu.training.callbacks import EarlyStop

    model = models.get("resnet18_cifar", num_classes=10)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    trainer = Trainer("e2e_earlystop", ckpt_root_dir=str(tmp_path))
    cb = EarlyStop(monitor="Accuracy", mode="max", patience=1)
    trainer.train(model, _quick_params(max_epochs=20), loader, loader, additional_callbacks=[cb])
    assert len(trainer.valid_metrics_history) < 20  # stopped early


def test_batch_is_sharded_over_mesh(tmp_path):
    """Sharding smoke test on the 8-device CPU mesh: global batch divides across devices."""
    import super_gradients_tpu as sg

    mesh = sg.setup_device(num_devices=8)
    model = models.get("resnet18_cifar", num_classes=10)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    trainer = Trainer("e2e_mesh", ckpt_root_dir=str(tmp_path))
    trainer.train(model, _quick_params(max_epochs=1), loader, loader)
    assert trainer.train_loss_history


def test_precise_bn_recomputes_stats(tmp_path):
    from super_gradients_tpu.training.precise_bn import compute_precise_bn_stats

    model = models.get("resnet18_cifar", num_classes=10)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    before = jax.device_get(model.batch_stats)
    compute_precise_bn_stats(model, loader, num_batches=2)
    after = jax.device_get(model.batch_stats)
    deltas = jax.tree_util.tree_map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), before, after)
    assert max(jax.tree_util.tree_leaves(deltas)) > 1e-4  # stats actually moved
    # and they are finite / sane
    assert all(np.isfinite(x).all() for x in jax.tree_util.tree_leaves(after))
