"""Dataloader adapter factory tests (ref training/dataloaders/adapters.py)."""

import numpy as np
import torch

from super_gradients_tpu.training.dataloader_adapters import (
    ClassificationDataloaderAdapterFactory,
    DetectionDataloaderAdapterFactory,
    SegmentationDataloaderAdapterFactory,
    adapt_detection_sample,
)


class _CHWClsDataset:
    """Torch-style dataset: CHW float tensor + int label."""

    def __len__(self):
        return 8

    def __getitem__(self, i):
        return torch.zeros(3, 16, 16) + i, i % 3


def test_classification_adapter_transposes_chw():
    loader = ClassificationDataloaderAdapterFactory.from_dataset(_CHWClsDataset(), batch_size=4)
    images, labels = next(iter(loader))
    assert images.shape == (4, 16, 16, 3) and images.dtype == np.float32
    assert labels.shape == (4,) and labels.dtype == np.int32


class _DetBoxesLastDataset:
    """Returns [N, 5] rows as (x1, y1, x2, y2, cls) — boxes-first layout."""

    def __len__(self):
        return 4

    def __getitem__(self, i):
        boxes = np.array([[10.5, 20.5, 30.5, 40.5, 2], [1.25, 2.25, 3.75, 4.75, 0]], np.float32)
        return np.zeros((16, 16, 3), np.float32), boxes


def test_detection_adapter_reorders_and_pads():
    loader = DetectionDataloaderAdapterFactory.from_dataset(_DetBoxesLastDataset(), batch_size=2, max_boxes=6)
    images, targets = next(iter(loader))
    assert targets.shape == (2, 6, 5)
    np.testing.assert_allclose(targets[0, 0], [2, 10.5, 20.5, 30.5, 40.5])  # cls moved to col 0
    assert (targets[0, 2:] == -1).all()  # padding


def test_detection_adapter_separate_boxes_labels():
    img, t = adapt_detection_sample(
        (np.zeros((8, 8, 3)), np.array([[1.0, 2, 3, 4]]), np.array([7])), max_boxes=3
    )
    np.testing.assert_allclose(t[0], [7, 1, 2, 3, 4])


class _SegCHWMaskDataset:
    def __len__(self):
        return 4

    def __getitem__(self, i):
        return torch.zeros(3, 16, 16), torch.zeros(1, 16, 16, dtype=torch.long)


def test_segmentation_adapter():
    loader = SegmentationDataloaderAdapterFactory.from_dataset(_SegCHWMaskDataset(), batch_size=2)
    images, masks = next(iter(loader))
    assert images.shape == (2, 16, 16, 3) and masks.shape == (2, 16, 16) and masks.dtype == np.int32


def test_from_dataloader_rebatches():
    batches = [(np.zeros((2, 3, 8, 8), np.float32), np.array([0, 1]))]
    out = list(ClassificationDataloaderAdapterFactory.from_dataloader(batches))
    images, labels = out[0]
    assert images.shape == (2, 8, 8, 3)
