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
