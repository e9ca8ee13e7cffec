"""Pose/segmentation export round-trips (ref module_interfaces/exportable_pose_estimation.py,
exportable_segmentation.py — VERDICT r1 #9b)."""

import os

import jax.numpy as jnp
import numpy as np

from super_gradients_tpu import models


def test_export_and_reload_pose_program(tmp_path):
    from super_gradients_tpu.conversion.export import export_pose_estimation_model, load_exported

    model = models.get("yolo_nas_pose_s", num_classes=17, image_size=64)
    out_path = str(tmp_path / "pose.stablehlo")
    result = export_pose_estimation_model(
        model, out_path, batch_size=2, image_hw=(64, 64), nms_top_k=64, max_predictions=5, nms_mode="fast"
    )
    assert os.path.exists(out_path)
    assert "uint8 [2, 64, 64, 3]" in result.usage_instructions

    exported = load_exported(out_path)
    imgs = np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    poses, boxes, scores, num = exported.call(jnp.asarray(imgs))
    assert poses.shape[:2] == (2, 5) and poses.shape[-1] == 3
    assert boxes.shape == (2, 5, 4)
    assert num.shape == (2,)


def test_export_and_reload_segmentation_program(tmp_path):
    from super_gradients_tpu.conversion.export import export_segmentation_model, load_exported

    model = models.get("stdc1_seg", num_classes=19, image_size=64)
    out_path = str(tmp_path / "seg.stablehlo")
    export_segmentation_model(model, out_path, batch_size=2, image_hw=(64, 64))
    exported = load_exported(out_path)
    imgs = np.random.RandomState(0).randint(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    seg = exported.call(jnp.asarray(imgs))
    seg = np.asarray(seg)
    assert seg.shape == (2, 64, 64)
    assert seg.dtype == np.int32
    assert seg.min() >= 0 and seg.max() < 19


def test_model_export_method_dispatch(tmp_path):
    """model.export(path) works per task (ref Exportable*Model.export user surface)."""
    m = models.get("stdc1_seg", num_classes=4, image_size=32)
    res = m.export(str(tmp_path / "m.stablehlo"), batch_size=1, image_hw=(32, 32))
    assert os.path.exists(res.output_path)
