"""Export, PTQ quantization, and KD trainer tests (deployment tier, SURVEY §2.7-2.8)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu import models


def test_export_and_reload_detection_program(tmp_path):
    from super_gradients_tpu.conversion.export import export_detection_model, load_exported

    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    out_path = str(tmp_path / "yolo_nas_s.stablehlo")
    result = export_detection_model(
        model, out_path, batch_size=2, image_hw=(64, 64), nms_top_k=64, max_predictions=10, nms_mode="fast"
    )
    assert os.path.exists(out_path)
    assert "uint8 [2, 64, 64, 3]" in result.usage_instructions

    exported = load_exported(out_path)
    imgs = np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    boxes, scores, labels, num = exported.call(jnp.asarray(imgs))
    assert boxes.shape == (2, 10, 4)
    assert num.shape == (2,)

    # parity: exported program == live predict program
    live = model.predict_batch_tensor(
        jnp.asarray(imgs, jnp.float32) / 255.0, conf=0.25, nms_top_k=64, max_predictions=10, nms_mode="fast",
        fuse_model=True, bf16=True,
    )
    np.testing.assert_allclose(np.asarray(num), np.asarray(live.num_detections))
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(live.boxes), rtol=1e-2, atol=1.0)


def test_ptq_weight_quantization_error_small(tmp_path):
    from super_gradients_tpu.training.quantization import SelectiveQuantizer, fake_quantize_params, ptq

    model = models.get("resnet18_cifar", num_classes=10)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 32, 32, 3).astype(np.float32))
    ref = np.asarray(model(x))

    q = SelectiveQuantizer().quantize_module(model.params)
    # int8 payloads actually int8
    leaves = jax.tree_util.tree_leaves(q.int8_params)
    assert any(getattr(l, "dtype", None) == jnp.int8 for l in leaves)

    fq = fake_quantize_params(model.params)
    model.update_variables({"params": fq, "batch_stats": model.batch_stats})
    got = np.asarray(model(x))
    # int8 per-channel weight error keeps logits close
    assert np.abs(got - ref).max() < 0.15
    # skip list respected
    q2 = SelectiveQuantizer(skip_modules=["linear"]).quantize_module(model.params)
    assert any("linear" in s for s in q2.skipped)


def test_ptq_calibration_collects_ranges():
    from super_gradients_tpu.training import dataloaders
    from super_gradients_tpu.training.quantization import ptq

    model = models.get("resnet18_cifar", num_classes=10)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 16, "batch_size": 8})
    model, table = ptq(model, calibration_loader=loader, calibration_batches=2)
    assert table is not None and len(table.ranges) > 10
    assert all(v >= 0 for v in table.ranges.values())


def test_kd_training_student_learns_from_teacher(tmp_path):
    from super_gradients_tpu.training import dataloaders
    from super_gradients_tpu.training.kd_trainer import KDLogitsLoss, KDModule, KDOutput, KDTrainer

    student = models.get("resnet18_cifar", num_classes=10, seed=1)
    teacher = models.get("resnet18_cifar", num_classes=10, seed=2)
    teacher_params_before = jax.device_get(teacher.params)
    student_params_before = jax.device_get(student.params)

    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 16, "batch_size": 8})
    trainer = KDTrainer("kd_e2e", ckpt_root_dir=str(tmp_path))
    trained_student = trainer.train(
        student=student,
        teacher=teacher,
        training_params=dict(max_epochs=1, initial_lr=0.01, save_model=False, average_best_models=False),
        train_loader=loader,
        valid_loader=None,
    )
    assert trained_student is student
    # student moved, teacher did not (stop_gradient freeze)
    s_delta = sum(float(np.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(student_params_before), jax.tree_util.tree_leaves(jax.device_get(student.params))))
    final_state = trainer.train_state
    t_delta = sum(float(np.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(teacher_params_before),
        jax.tree_util.tree_leaves(jax.device_get(final_state.params["teacher"]))))
    assert s_delta > 0
    assert t_delta == 0


def test_kd_logits_loss_components():
    from super_gradients_tpu.training.kd_trainer import KDLogitsLoss, KDOutput

    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 10, 4))
    loss_fn = KDLogitsLoss(distillation_loss_coeff=0.5, temperature=2.0)
    # teacher == student -> KL term ~0
    total, aux = loss_fn(KDOutput(s, s), targets)
    assert float(aux["distillation_loss"]) == pytest.approx(0.0, abs=1e-5)
    # different teacher -> positive KL
    t = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    _, aux2 = loss_fn(KDOutput(s, t), targets)
    assert float(aux2["distillation_loss"]) > 0
