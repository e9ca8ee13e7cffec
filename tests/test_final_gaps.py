import json
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image


def test_coco_pose_dataset(tmp_path):
    from super_gradients_tpu.training.datasets import COCOPoseEstimationDataset

    (tmp_path / "imgs").mkdir()
    Image.fromarray(np.zeros((60, 80, 3), np.uint8)).save(tmp_path / "imgs" / "p.jpg")
    kpts = []
    for j in range(17):
        kpts += [10 + j, 20 + j, 2]
    coco = {
        "images": [{"id": 1, "file_name": "p.jpg", "width": 80, "height": 60}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
                         "num_keypoints": 17, "bbox": [5, 5, 40, 50], "keypoints": kpts}],
        "categories": [{"id": 1, "name": "person"}],
    }
    with open(tmp_path / "kp.json", "w") as f:
        json.dump(coco, f)
    ds = COCOPoseEstimationDataset(str(tmp_path), "kp.json", "imgs", max_poses=4)
    img, t = ds[0]
    assert t.shape == (4, 5 + 51)
    assert t[0, 0] == 0 and t[1, 0] == -1
    np.testing.assert_allclose(t[0, 1:5], [5, 5, 45, 55])
    np.testing.assert_allclose(t[0, 5:8], [10, 20, 2])


def test_cwd_kd_loss():
    from super_gradients_tpu.training.losses.kd_losses import KDOutput
    from super_gradients_tpu.training.losses.segmentation_losses import ChannelWiseKnowledgeDistillationLoss

    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    loss_fn = ChannelWiseKnowledgeDistillationLoss()
    zero, _ = loss_fn(KDOutput(s, s))
    assert abs(float(zero)) < 1e-4
    t = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    pos, _ = loss_fn(KDOutput(s, t))
    assert float(pos) > 0


def test_r_squared_loss():
    from super_gradients_tpu.training.losses.classification_losses import RSquaredLoss

    y = jnp.asarray([1.0, 2, 3, 4])
    perfect, _ = RSquaredLoss()(y, y)
    assert abs(float(perfect)) < 1e-6
    bad, _ = RSquaredLoss()(jnp.zeros(4), y)
    assert float(bad) > 0.5


def test_depth_metrics():
    from super_gradients_tpu.training.metrics.depth import DeltaMetric, DepthMAE, DepthRMSE

    pred = jnp.asarray([[1.0, 2.0, 3.0, -1.0]])
    gt = jnp.asarray([[1.0, 2.5, 3.0, -1.0]])
    mae = DepthMAE()
    s = mae.update(mae.init(), pred, gt)
    # ignore_val -1 masked out; mean |err| over 3 valid px... -1 equals ignore so masked
    assert abs(mae.compute(s)["DepthMAE"] - 0.5 / 3) < 1e-5
    d = DeltaMetric()
    sd = d.update(d.init(), pred, gt)
    assert 0 <= d.compute(sd)["Delta1"] <= 1


def test_object_names_match_registries():
    from super_gradients_tpu import models  # ensures registration
    from super_gradients_tpu.common.object_names import Losses, Metrics, Models
    from super_gradients_tpu.common.registry import ARCHITECTURES, LOSSES, METRICS

    for cls, reg in [(Models, ARCHITECTURES), (Losses, LOSSES), (Metrics, METRICS)]:
        for attr in dir(cls):
            if attr.startswith("_"):
                continue
            name = getattr(cls, attr)
            assert name in reg, f"{cls.__name__}.{attr} = `{name}` not registered"


def test_dataset_statistics_logger():
    from super_gradients_tpu.training import dataloaders
    from super_gradients_tpu.training.dataset_statistics import DatasetStatisticsLogger

    loader = dataloaders.get("detection_test_dataloader", dataset_params={"image_size": (64, 64), "dataset_size": 16, "batch_size": 8, "num_classes": 5})
    stats = DatasetStatisticsLogger().analyze(loader, max_batches=2)
    assert stats["images_analyzed"] == 16
    assert stats["total_boxes"] > 0
    assert stats["box_width_mean"] > 0
