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


@pytest.mark.slow  # heavy e2e training — opt-in tier
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


@pytest.mark.heavy  # compile-heavy; nightly tier
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


@pytest.mark.heavy  # compile-heavy; nightly tier
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


def test_resume_restores_optimizer_state(tmp_path):
    """Momentum/moments must survive resume (ref sg_trainer.py:692-715)."""
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    m1 = models.get("resnet18_cifar", num_classes=10)
    t1 = Trainer("e2e_opt_resume", ckpt_root_dir=str(tmp_path))
    t1.train(m1, _quick_params(max_epochs=1), loader, loader)
    opt1 = jax.device_get(t1.train_state.opt_state)

    # resume with max_epochs=1: loop body never runs, state == restored checkpoint
    m2 = models.get("resnet18_cifar", num_classes=10)
    t2 = Trainer("e2e_opt_resume", ckpt_root_dir=str(tmp_path))
    t2.train(m2, _quick_params(max_epochs=1, resume=True), loader, loader)
    opt2 = jax.device_get(t2.train_state.opt_state)

    leaves1 = jax.tree_util.tree_leaves(opt1)
    leaves2 = jax.tree_util.tree_leaves(opt2)
    assert len(leaves1) == len(leaves2)
    # SGD momentum buffers are nonzero after a real epoch and must match exactly
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves1 if np.asarray(l).ndim > 0)
    for l1, l2 in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6, atol=1e-7)


def test_test_loaders_are_evaluated(tmp_path):
    """test_loaders must be evaluated per epoch (ref sg_trainer.py:1596-1615)."""
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    tloader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 16, "batch_size": 16})
    model = models.get("resnet18_cifar", num_classes=10)
    trainer = Trainer("e2e_testloaders", ckpt_root_dir=str(tmp_path))
    trainer.train(model, _quick_params(max_epochs=2), loader, loader, test_loaders={"holdout": tloader})
    assert len(trainer.test_metrics_history) == 2
    assert "Accuracy" in trainer.test_metrics_history[-1]["holdout"]


def test_train_phase_metrics(tmp_path):
    """train_metrics_list computes metrics on training outputs (ref :519-528)."""
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    model = models.get("resnet18_cifar", num_classes=10)
    trainer = Trainer("e2e_trainmetrics", ckpt_root_dir=str(tmp_path))
    trainer.train(model, _quick_params(max_epochs=1, train_metrics_list=["Accuracy", "Top5"]), loader, loader)
    assert len(trainer.train_metrics_history) == 1
    assert 0.0 <= trainer.train_metrics_history[0]["Accuracy"] <= 1.0
    assert "Top5" in trainer.train_metrics_history[0]


def test_frozen_param_patterns(tmp_path):
    """frozen_param_patterns subtrees get zero updates AND zero weight decay."""
    model = models.get("resnet18_cifar", num_classes=10)
    frozen_key = sorted(model.params.keys())[0]
    before = jax.device_get(model.params[frozen_key])
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    trainer = Trainer("e2e_frozen", ckpt_root_dir=str(tmp_path))
    params = _quick_params(
        max_epochs=1,
        frozen_param_patterns=[frozen_key],
        optimizer_params={"momentum": 0.9, "weight_decay": 0.1},  # aggressive WD: would visibly decay
    )
    model = trainer.train(model, params, loader, loader)
    after = jax.device_get(model.params[frozen_key])
    for l1, l2 in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_partial_final_validation_batch(tmp_path):
    """A final val batch not divisible by the mesh batch axis must not crash
    (falls back to replicated placement — ADVICE r1)."""
    import super_gradients_tpu as sg

    sg.setup_device(num_devices=8)
    model = models.get("resnet18_cifar", num_classes=10)
    train_loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 32, "batch_size": 16})
    val_ds = dataloaders.RandomClassificationDataset(num_samples=21, image_size=(32, 32), num_classes=10)
    val_loader = dataloaders.DataLoader(val_ds, batch_size=16, drop_last=False)  # final batch = 5
    trainer = Trainer("e2e_partial", ckpt_root_dir=str(tmp_path))
    trainer.train(model, _quick_params(max_epochs=1), train_loader, val_loader)
    assert trainer.valid_metrics_history


def test_resume_experiment_classmethod(tmp_path):
    """resume_experiment reloads the persisted recipe (ref sg_trainer.py:309-329)."""
    cfg = {
        "experiment_name": "e2e_resume_exp",
        "ckpt_root_dir": str(tmp_path),
        "architecture": "resnet18_cifar",
        "num_classes": 10,
        "train_dataloader": "classification_test_dataloader",
        "val_dataloader": "classification_test_dataloader",
        "dataset_params": {
            "train_dataset_params": {"image_size": (32, 32), "dataset_size": 32, "batch_size": 16},
            "val_dataset_params": {"image_size": (32, 32), "dataset_size": 32, "batch_size": 16},
        },
        "training_hyperparams": _quick_params(max_epochs=1),
    }
    _, t1 = Trainer.train_from_config(cfg)
    assert os.path.exists(os.path.join(t1.ckpt_dir, "recipe.json"))
    step1 = int(t1.train_state.step)

    _, t2 = Trainer.resume_experiment("e2e_resume_exp", ckpt_root_dir=str(tmp_path))
    # resumed at epoch 1 == max_epochs → no extra steps, state restored
    assert int(t2.train_state.step) == step1
