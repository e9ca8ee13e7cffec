"""RF100 metadata/wrapper, MaskAttentionLoss, and the gated albumentations bridge."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu.training.datasets_roboflow import (
    RF100_DATASETS,
    RoboflowDetectionDataset,
    get_dataset_metadata,
    get_dataset_num_classes,
    list_datasets,
)
from super_gradients_tpu.training.losses.segmentation_losses import (
    MaskAttentionLoss,
    pixel_cross_entropy,
)


def test_rf100_inventory():
    assert len(RF100_DATASETS) == 100
    assert len(list_datasets()) == 100
    aerial = list_datasets(["aerial"])
    assert aerial and all(RF100_DATASETS[n][0] == "aerial" for n in aerial)
    md = get_dataset_metadata("abdomen-mri")
    assert md["num_classes"] == 1 and md["size"] == md["train"] + md["valid"] + md["test"]
    assert get_dataset_num_classes("activity-diagrams-qdobr") == 19
    with pytest.raises(ValueError):
        get_dataset_num_classes("not-a-dataset")
    assert get_dataset_metadata("not-a-dataset") is None


def test_roboflow_dataset_loads_coco_format(tmp_path):
    # minimal RF100-layout dataset
    split_dir = tmp_path / "digits-t2eg6" / "valid"
    os.makedirs(split_dir)
    from PIL import Image

    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(split_dir / "im0.jpg")
    ann = {
        "images": [{"id": 1, "file_name": "im0.jpg", "width": 32, "height": 32}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1, "bbox": [2, 3, 10, 12], "iscrowd": 0, "area": 120}],
        "categories": [{"id": 1, "name": "digit"}],
    }
    (split_dir / "_annotations.coco.json").write_text(json.dumps(ann))

    ds = RoboflowDetectionDataset(data_dir=str(tmp_path), dataset_name="digits-t2eg6", split="valid")
    assert len(ds) == 1
    assert ds.metadata["category"] == RF100_DATASETS["digits-t2eg6"][0]
    with pytest.raises(ValueError):
        RoboflowDetectionDataset(data_dir=str(tmp_path), dataset_name="digits-t2eg6", split="val")


def test_mask_attention_loss_weights_foreground():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 3, (2, 8, 8)).astype(np.int32))
    mask = jnp.zeros((2, 8, 8)).at[:, :4].set(1.0)

    loss_eq, aux = MaskAttentionLoss(loss_weights=(1.0, 1.0))(logits, targets, mask)
    base = float(aux["loss_base"])
    # more weight on mask -> loss moves toward the masked-region mean
    loss_hi, aux_hi = MaskAttentionLoss(loss_weights=(1.0, 3.0))(logits, targets, mask)
    assert float(loss_hi) == pytest.approx(base + 3.0 * float(aux_hi["loss_mask"]), rel=1e-5)

    # empty mask -> mask term is 0, total == w0 * base
    loss0, aux0 = MaskAttentionLoss(loss_weights=(1.0, 2.0))(logits, targets, jnp.zeros((2, 8, 8)))
    assert float(aux0["loss_mask"]) == 0.0
    assert float(loss0) == pytest.approx(base, rel=1e-5)

    with pytest.raises(ValueError):
        MaskAttentionLoss(loss_weights=(1.0,))
    with pytest.raises(ValueError):
        MaskAttentionLoss(loss_weights=(1.0, 0.0))


def test_mask_attention_respects_ignore_index():
    logits = jnp.zeros((1, 4, 4, 2))
    targets = jnp.full((1, 4, 4), 255, jnp.int32)  # all void
    loss, aux = MaskAttentionLoss()(logits, targets, jnp.ones((1, 4, 4)))
    assert float(loss) == 0.0


def test_albumentations_bridge_gated():
    try:
        import albumentations  # noqa: F401

        has_album = True
    except ImportError:
        has_album = False
    from super_gradients_tpu.training.transforms.albumentations_bridge import AlbumentationsAdaptor

    if not has_album:
        with pytest.raises(ImportError, match="albumentations"):
            AlbumentationsAdaptor(config={"Compose": {"transforms": []}})
    else:
        adaptor = AlbumentationsAdaptor(config={"Compose": {"transforms": [{"HorizontalFlip": {"p": 1.0}}]}})
        img = np.arange(48, dtype=np.float32).reshape(4, 4, 3)
        out = adaptor(img)
        np.testing.assert_allclose(out, img[:, ::-1])


def test_registered_names():
    from super_gradients_tpu.common.registry import DATASETS, LOSSES, TRANSFORMS

    assert "RoboflowDetectionDataset" in DATASETS
    assert "MaskAttentionLoss" in LOSSES
    assert "Albumentations" in TRANSFORMS
