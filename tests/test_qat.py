
"""Real QAT: in-graph fake-quant of weights AND activations with STE, consuming
the calibration table (ref selective_quantization_utils.py:50, calibrator.py:27-151)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.training import dataloaders
from super_gradients_tpu.training.quantization import (
    CalibrationTable,
    QuantizationCalibrator,
    fake_quant_ste,
    fake_quantize_params_ste,
    make_qat_forward,
)


def test_fake_quant_ste_grad_flows():
    """STE: value on the int8 grid, gradient passes straight through."""
    x = jnp.asarray([0.11, -0.49, 0.73])
    scale = 0.01

    def f(x):
        return jnp.sum(fake_quant_ste(x, scale) ** 2)

    g = jax.grad(f)(x)
    q = fake_quant_ste(x, scale)
    np.testing.assert_allclose(np.asarray(q), np.round(np.asarray(x) / scale) * scale, atol=1e-6)
    assert float(jnp.abs(g).sum()) > 0  # non-zero despite round()


def test_calibration_table_is_consumed_by_forward():
    """Activation fake-quant must actually change the forward outputs."""
    model = models.get("resnet18_cifar", num_classes=4)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 8, "batch_size": 8, "num_classes": 4})
    table = QuantizationCalibrator(method="max").calibrate_model(model, loader, num_batches=1)
    assert len(table.ranges) > 10
    # canonical keys must match module paths (no __call__/index junk)
    assert all("__call__" not in k for k in table.ranges)

    x = jnp.asarray(next(iter(loader))[0])
    baseline = model.module.apply(model.variables, x, train=False)

    # coarse 4-bit-style grid => visible quantization error
    coarse = CalibrationTable({k: v * 16 for k, v in table.ranges.items()})
    apply_fn, ptrans = make_qat_forward(model.module, {"calibration_table": coarse})
    quantized = apply_fn({"params": ptrans(model.params), "batch_stats": model.batch_stats}, x, train=False)
    diff = float(jnp.abs(baseline - quantized).max())
    assert diff > 1e-4, "activation quantization did not alter the forward — table not consumed"


@pytest.mark.heavy  # compile-heavy; nightly tier
def test_weight_ste_quantization_differentiable():
    model = models.get("resnet18_cifar", num_classes=4)
    fq = fake_quantize_params_ste(model.params)
    # every conv kernel sits on its per-channel grid
    k0 = jax.tree_util.tree_leaves(fq)[0]
    assert np.isfinite(np.asarray(k0)).all()

    def loss(p):
        fqp = fake_quantize_params_ste(p)
        return sum(jnp.sum(l**2) for l in jax.tree_util.tree_leaves(fqp))

    g = jax.grad(loss)(model.params)
    assert max(float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)) > 0


@pytest.mark.slow  # heavy e2e training — opt-in tier
def test_qat_recovers_ptq_accuracy(tmp_path):
    """QAT fine-tune accuracy >= plain PTQ accuracy on a learnable task
    (VERDICT r1 'done' criterion for real QAT)."""
    from super_gradients_tpu.training.qat_trainer import QATTrainer
    from super_gradients_tpu.training.quantization import ptq
    from super_gradients_tpu.training.trainer import Trainer

    ds = dataloaders.RandomClassificationDataset(num_samples=64, image_size=(32, 32), num_classes=3)
    for i in range(len(ds)):
        ds._images[i, :, :, ds._labels[i]] += 1.0
    loader = dataloaders.DataLoader(ds, batch_size=16, shuffle=True)

    # pretrain a float model so PTQ has something to quantize
    model = models.get("resnet18_cifar", num_classes=3)
    pre = Trainer("qat_pre", ckpt_root_dir=str(tmp_path))
    params = dict(max_epochs=4, initial_lr=0.01, loss="CrossEntropyLoss",
                  optimizer_params={"momentum": 0.9},
                  valid_metrics_list=["Accuracy"], metric_to_watch="Accuracy", save_model=False)
    model = pre.train(model, params, loader, loader)

    # PTQ-only accuracy
    import copy

    ptq_model = models.get("resnet18_cifar", num_classes=3)
    ptq_model.update_variables(jax.device_get(model.variables))
    ptq_model, _ = ptq(ptq_model, calibration_loader=loader, calibration_batches=1)
    ptq_acc = pre.evaluate(ptq_model, loader, metrics_list=["Accuracy"])["Accuracy"]

    # QAT fine-tune (in-graph fake quant)
    qat_model = models.get("resnet18_cifar", num_classes=3)
    qat_model.update_variables(jax.device_get(model.variables))
    qt = QATTrainer("qat_ft", ckpt_root_dir=str(tmp_path))
    qat_model, table = qt.quantize(
        qat_model, calib_loader=loader,
        training_params=dict(max_epochs=20, initial_lr=0.01, loss="CrossEntropyLoss",
                             optimizer_params={"momentum": 0.9},
                             valid_metrics_list=["Accuracy"], metric_to_watch="Accuracy", save_model=False),
        train_loader=loader, valid_loader=loader, calibration_batches=1,
    )
    assert table is not None and len(table.ranges) > 0
    qat_acc = qt.evaluate(qat_model, loader, metrics_list=["Accuracy"])["Accuracy"]
    assert qat_acc >= ptq_acc - 1e-6, f"QAT ({qat_acc}) should recover >= PTQ ({ptq_acc})"
