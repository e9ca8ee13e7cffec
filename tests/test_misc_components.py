"""Tests: classification augs, bbox-format registry, QAT flow, auto batch size,
output adapter, API surface snapshot (breaking-change analogue)."""

import numpy as np
import pytest


def test_randaugment_and_erase():
    import random

    from super_gradients_tpu.training.transforms.classification import RandAugment, RandomErase

    random.seed(0)
    img = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
    out = RandAugment(num_ops=2, magnitude=9)(img)
    assert out.shape == img.shape
    out2 = RandomErase(probability=1.0)(img)
    assert out2.shape == img.shape
    assert not np.array_equal(out2, img)


def test_mixup_cutmix_soft_labels():
    from super_gradients_tpu.training.transforms.classification import cutmix_batch, mixup_batch

    rng = np.random.RandomState(0)
    imgs = rng.rand(8, 16, 16, 3).astype(np.float32)
    labels = rng.randint(0, 5, 8)
    mixed, soft = mixup_batch(imgs, labels, 5, rng=rng)
    assert mixed.shape == imgs.shape and soft.shape == (8, 5)
    np.testing.assert_allclose(soft.sum(1), 1.0, atol=1e-5)
    cm, cs = cutmix_batch(imgs, labels, 5, rng=rng)
    np.testing.assert_allclose(cs.sum(1), 1.0, atol=1e-5)


def test_bbox_format_conversions_normalized():
    from super_gradients_tpu.training.datasets_formats import convert_bboxes

    boxes = np.asarray([[10.0, 20, 50, 80]])
    out = convert_bboxes(boxes, (100, 200), "xyxy", "normalized_cxcywh")
    np.testing.assert_allclose(out, [[30 / 200, 50 / 100, 40 / 200, 60 / 100]], atol=1e-5)
    back = convert_bboxes(out, (100, 200), "normalized_cxcywh", "xyxy")
    np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_concatenated_format_converter():
    from super_gradients_tpu.training.datasets_formats import (
        LABEL_CXCYWH,
        XYXY_LABEL,
        ConcatenatedTensorFormatConverter,
    )

    conv = ConcatenatedTensorFormatConverter(XYXY_LABEL, LABEL_CXCYWH)
    t = np.asarray([[10.0, 20, 50, 80, 3]])
    out = conv(t)
    np.testing.assert_allclose(out, [[3, 30, 50, 40, 60]], atol=1e-5)


def test_detection_output_adapter_flat():
    from super_gradients_tpu.training.datasets_formats import DetectionOutputAdapter

    class Fake:
        boxes = np.asarray([[[1.0, 2, 3, 4], [0, 0, 0, 0]], [[5.0, 6, 7, 8], [9, 9, 10, 10]]])
        scores = np.asarray([[0.9, 0.0], [0.8, 0.7]])
        labels = np.asarray([[2, -1], [1, 0]])
        num_detections = np.asarray([1, 2])

    flat = DetectionOutputAdapter("flat")(Fake)
    assert flat.shape == (3, 7)
    assert flat[0].tolist() == [0, 1, 2, 3, 4, pytest.approx(0.9), 2]
    assert flat[1, 0] == 1  # second image rows


def test_modify_params_for_qat():
    from super_gradients_tpu.training.pre_launch_callbacks import modify_params_for_qat

    tp = modify_params_for_qat({"initial_lr": 0.1, "max_epochs": 50, "ema": True, "lr_warmup_epochs": 3})
    assert tp["initial_lr"] == pytest.approx(0.01)
    assert tp["max_epochs"] == 5
    assert tp["ema"] is False and tp["lr_warmup_epochs"] == 0


def test_qat_trainer_flow(tmp_path):
    from super_gradients_tpu import models
    from super_gradients_tpu.training import dataloaders
    from super_gradients_tpu.training.qat_trainer import QATTrainer

    model = models.get("resnet18_cifar", num_classes=10)
    loader = dataloaders.get("classification_test_dataloader", dataset_params={"image_size": (32, 32), "dataset_size": 16, "batch_size": 8})
    trainer = QATTrainer("qat_e2e", ckpt_root_dir=str(tmp_path))
    model, table = trainer.quantize(
        model,
        calib_loader=loader,
        training_params=dict(max_epochs=10, initial_lr=0.01, loss="CrossEntropyLoss", save_model=False,
                             average_best_models=False, valid_metrics_list=[]),
        train_loader=loader,
        calibration_batches=1,
    )
    assert table is not None and len(table.ranges) > 0
    # weights land on the int8 grid: quantizing again is idempotent
    from super_gradients_tpu.training.quantization import fake_quantize_params
    import jax

    p1 = model.params
    p2 = fake_quantize_params(p1)
    deltas = jax.tree_util.tree_map(lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()), p1, p2)
    assert max(jax.tree_util.tree_leaves(deltas)) < 1e-5


def test_memory_analysis_batch_estimate():
    from super_gradients_tpu import models
    from super_gradients_tpu.training.losses import get_loss
    from super_gradients_tpu.training.pre_launch_callbacks import estimate_train_step_memory_gb

    model = models.get("resnet18_cifar", num_classes=10)
    gb8 = estimate_train_step_memory_gb(model, 8, (32, 32), get_loss("CrossEntropyLoss"))
    gb64 = estimate_train_step_memory_gb(model, 64, (32, 32), get_loss("CrossEntropyLoss"))
    if gb8 is not None and gb64 is not None:  # backend-dependent
        assert gb64 > gb8


def test_public_api_surface_snapshot():
    """Breaking-change analogue (ref tests/breaking_change_tests): key public names
    must stay importable."""
    import super_gradients_tpu as sg

    assert callable(sg.models.get)
    assert callable(sg.Trainer)
    assert callable(sg.setup_device)
    from super_gradients_tpu.common.registry import ALL_REGISTRIES

    zoo = ALL_REGISTRIES["architectures"]
    for name in [
        "resnet18", "resnet50", "yolo_nas_s", "yolo_nas_m", "yolo_nas_l",
        "ppyoloe_s", "yolox_s", "ssd_lite_mobilenet_v2",
        "stdc1_seg", "pp_lite_t_seg", "ddrnet_23",
        "yolo_nas_pose_s", "mobilenet_v2", "efficientnet_b0", "vit_base",
    ]:
        assert name in zoo, f"public architecture `{name}` missing"
    losses = ALL_REGISTRIES["losses"]
    for name in ["CrossEntropyLoss", "PPYoloELoss", "YoloNASPoseLoss", "YoloXDetectionLoss", "SSDLoss", "STDCLoss", "DiceLoss", "KDLogitsLoss"]:
        assert name in losses, f"public loss `{name}` missing"
    metrics = ALL_REGISTRIES["metrics"]
    for name in ["Accuracy", "Top5", "DetectionMetrics", "IoU", "PixelAccuracy", "PoseEstimationMetrics"]:
        assert name in metrics, f"public metric `{name}` missing"
