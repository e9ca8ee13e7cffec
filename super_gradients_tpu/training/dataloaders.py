"""Dataloaders: host-side numpy pipelines feeding the device mesh.

Reference parity: ``training/dataloaders/dataloaders.py`` — ``get(name | dataset,
dataset_params, dataloader_params)`` (:889) + named test loaders with zero-tensor
datasets (:585-606) used across the e2e test-suite.

TPU-native notes: batches are numpy pytrees ``(inputs, targets)``; the Trainer
device_puts them with batch-axis sharding. On multi-host each process loads its
``jax.process_index()``-keyed shard (``sharded=True``). Static shapes: detection
targets are padded to ``[B, max_boxes, 5]`` (cls, x1, y1, x2, y2) with -1 class
padding — replacing the reference's ragged ``[N, 6]`` format (SURVEY §7).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.registry import DATALOADERS, register_dataloader

logger = get_logger(__name__)


class DataLoader:
    """Minimal epoch-reshuffling loader over an indexable dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int = 32,
        shuffle: bool = False,
        drop_last: bool = True,
        collate_fn: Optional[Callable] = None,
        seed: int = 0,
        min_samples: Optional[int] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.seed = seed
        self._epoch = 0
        # min_samples padding (ref dataloaders.py:165-227): repeat indices so tiny
        # datasets still fill every batch
        n = len(dataset)
        if min_samples is not None and n < min_samples:
            reps = math.ceil(min_samples / n)
            self._indices = np.tile(np.arange(n), reps)[:min_samples]
        else:
            self._indices = np.arange(n)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        n = len(self._indices)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def __iter__(self) -> Iterator:
        idx = self._indices.copy()
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        for i in range(len(self)):
            chunk = idx[i * self.batch_size : (i + 1) * self.batch_size]
            samples = [self.dataset[int(j)] for j in chunk]
            yield self.collate_fn(samples)


def default_collate(samples: Sequence[Tuple]) -> Tuple:
    """Stack tuple elements into numpy arrays."""
    transposed = list(zip(*samples))
    return tuple(np.stack([np.asarray(s) for s in col]) for col in transposed)


# ------------------------------------------------------------- fake datasets
# (reference ships zero-tensor TensorDatasets in the library for tests,
# dataloaders.py:585-606 — same approach here)


class RandomClassificationDataset:
    def __init__(self, num_samples: int = 64, image_size: Tuple[int, int] = (64, 64), num_classes: int = 10, channels: int = 3, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.channels = channels
        self.rng = np.random.RandomState(seed)
        self._images = self.rng.rand(num_samples, *self.image_size, channels).astype(np.float32)
        self._labels = self.rng.randint(0, num_classes, size=num_samples).astype(np.int32)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        return self._images[i], self._labels[i]


class RandomDetectionDataset:
    """Images + padded [max_boxes, 5] targets (cls, x1, y1, x2, y2), -1 = pad."""

    def __init__(self, num_samples: int = 32, image_size: Tuple[int, int] = (320, 320), num_classes: int = 80, max_boxes: int = 20, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.max_boxes = max_boxes
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        rng = np.random.RandomState(self.rng.randint(0, 2**31) if False else i)
        h, w = self.image_size
        img = rng.rand(h, w, 3).astype(np.float32)
        n = rng.randint(1, max(2, self.max_boxes // 2))
        cxy = rng.rand(n, 2) * [w * 0.8, h * 0.8] + [w * 0.1, h * 0.1]
        wh = rng.rand(n, 2) * [w * 0.3, h * 0.3] + 8
        x1y1 = np.maximum(cxy - wh / 2, 0)
        x2y2 = np.minimum(cxy + wh / 2, [w, h])
        cls = rng.randint(0, self.num_classes, size=(n, 1)).astype(np.float32)
        target = np.full((self.max_boxes, 5), -1.0, dtype=np.float32)
        target[:n] = np.concatenate([cls, x1y1, x2y2], axis=1)
        return img, target


class RandomPoseDataset:
    """Images + padded [max_poses, 5 + 3K] pose targets (valid, box, K*(x,y,v))."""

    def __init__(self, num_samples: int = 16, image_size: Tuple[int, int] = (64, 64), num_joints: int = 17, max_poses: int = 8, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_joints = num_joints
        self.max_poses = max_poses
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        h, w = self.image_size
        k = self.num_joints
        img = rng.rand(h, w, 3).astype(np.float32)
        n = rng.randint(1, max(2, self.max_poses // 2))
        target = np.full((self.max_poses, 5 + 3 * k), -1.0, dtype=np.float32)
        for j in range(n):
            cx, cy = rng.rand(2) * [w * 0.6, h * 0.6] + [w * 0.2, h * 0.2]
            bw, bh = rng.rand(2) * [w * 0.3, h * 0.3] + 10
            x1, y1 = max(cx - bw / 2, 0), max(cy - bh / 2, 0)
            x2, y2 = min(cx + bw / 2, w), min(cy + bh / 2, h)
            kp = np.stack([
                rng.uniform(x1, x2, k), rng.uniform(y1, y2, k), rng.randint(0, 3, k).astype(np.float64)
            ], axis=1)
            target[j, 0] = 0.0
            target[j, 1:5] = [x1, y1, x2, y2]
            target[j, 5:] = kp.reshape(-1)
        return img, target


@register_dataloader("pose_test_dataloader")
def pose_test_dataloader(batch_size: int = 8, image_size: Tuple[int, int] = (64, 64), dataset_size: int = 16, num_joints: int = 17, **kw) -> DataLoader:
    return DataLoader(RandomPoseDataset(dataset_size, image_size, num_joints), batch_size=batch_size, shuffle=True)


class RandomSegmentationDataset:
    def __init__(self, num_samples: int = 16, image_size: Tuple[int, int] = (128, 128), num_classes: int = 19, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        h, w = self.image_size
        return rng.rand(h, w, 3).astype(np.float32), rng.randint(0, self.num_classes, size=(h, w)).astype(np.int32)


# ------------------------------------------------------------ named loaders


@register_dataloader("classification_test_dataloader")
def classification_test_dataloader(batch_size: int = 16, image_size: Tuple[int, int] = (64, 64), dataset_size: int = 64, num_classes: int = 10, **kw) -> DataLoader:
    return DataLoader(RandomClassificationDataset(dataset_size, image_size, num_classes), batch_size=batch_size, shuffle=True)


@register_dataloader("detection_test_dataloader")
def detection_test_dataloader(batch_size: int = 8, image_size: Tuple[int, int] = (320, 320), dataset_size: int = 32, num_classes: int = 80, max_boxes: int = 20, **kw) -> DataLoader:
    return DataLoader(RandomDetectionDataset(dataset_size, image_size, num_classes, max_boxes), batch_size=batch_size, shuffle=True)


@register_dataloader("segmentation_test_dataloader")
def segmentation_test_dataloader(batch_size: int = 4, image_size: Tuple[int, int] = (128, 128), dataset_size: int = 16, num_classes: int = 19, **kw) -> DataLoader:
    return DataLoader(RandomSegmentationDataset(dataset_size, image_size, num_classes), batch_size=batch_size, shuffle=True)


def get(name: Optional[str] = None, dataset=None, dataset_params: Optional[Dict] = None, dataloader_params: Optional[Dict] = None) -> DataLoader:
    """Named-loader factory (ref dataloaders.py:889)."""
    dataset_params = dict(dataset_params or {})
    dataloader_params = dict(dataloader_params or {})
    if name is not None:
        if name not in DATALOADERS:
            raise KeyError(f"Unknown dataloader `{name}`; registered: {sorted(DATALOADERS)}")
        return DATALOADERS[name](**dataset_params, **dataloader_params)
    if dataset is None:
        raise ValueError("Either `name` or `dataset` must be provided")
    return DataLoader(dataset, **dataloader_params)


# ----------------------------------------------- real-data named loaders
# (reference dataloaders.py:229-887 — COCO/Cityscapes/ImageNet named factories)


def _yolo_nas_train_transforms(input_dim=(640, 640)):
    from super_gradients_tpu.training.transforms.detection import (
        DetectionHSV,
        DetectionHorizontalFlip,
        DetectionMixup,
        DetectionMosaic,
        DetectionPaddedRescale,
        DetectionRandomAffine,
        DetectionStandardize,
    )

    return [
        DetectionMosaic(input_dim=input_dim, prob=1.0),
        DetectionRandomAffine(degrees=10, translate=0.1, scales=(0.5, 1.5), shear=2.0, target_size=input_dim),
        DetectionMixup(prob=0.5),
        DetectionHSV(prob=1.0, hgain=5, sgain=30, vgain=30),
        DetectionHorizontalFlip(prob=0.5),
        DetectionPaddedRescale(input_dim=input_dim),
        DetectionStandardize(max_value=255.0),
    ]


def _yolo_nas_val_transforms(input_dim=(640, 640)):
    from super_gradients_tpu.training.transforms.detection import DetectionPaddedRescale, DetectionStandardize

    return [DetectionPaddedRescale(input_dim=input_dim), DetectionStandardize(max_value=255.0)]


@register_dataloader("coco2017_train_yolo_nas")
@register_dataloader("coco2017_train")
def coco2017_train_yolo_nas(data_dir: str, batch_size: int = 16, input_dim=(640, 640), max_boxes: int = 120,
                            subdir: str = "images/train2017", json_file: str = "instances_train2017.json", **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import COCODetectionDataset

    ds = COCODetectionDataset(
        data_dir=data_dir, subdir=subdir, json_file=json_file,
        transforms=_yolo_nas_train_transforms(tuple(input_dim)), max_boxes=max_boxes,
        ignore_empty_annotations=True,
    )
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("coco2017_val_yolo_nas")
@register_dataloader("coco2017_val")
def coco2017_val_yolo_nas(data_dir: str, batch_size: int = 32, input_dim=(640, 640), max_boxes: int = 120,
                          subdir: str = "images/val2017", json_file: str = "instances_val2017.json", **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import COCODetectionDataset

    ds = COCODetectionDataset(
        data_dir=data_dir, subdir=subdir, json_file=json_file,
        transforms=_yolo_nas_val_transforms(tuple(input_dim)), max_boxes=max_boxes,
    )
    return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False)


@register_dataloader("imagenet_train")
def imagenet_train(data_dir: str, batch_size: int = 128, image_size=(224, 224), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import ImageFolderDataset

    return DataLoader(ImageFolderDataset(data_dir, tuple(image_size)), batch_size=batch_size, shuffle=True)


@register_dataloader("imagenet_val")
def imagenet_val(data_dir: str, batch_size: int = 128, image_size=(224, 224), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import ImageFolderDataset

    return DataLoader(ImageFolderDataset(data_dir, tuple(image_size)), batch_size=batch_size, shuffle=False, drop_last=False)


@register_dataloader("segmentation_train")
@register_dataloader("cityscapes_stdc_seg50_train")
def segmentation_train(root: str, batch_size: int = 8, image_size=(512, 1024), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import SegmentationDataset

    return DataLoader(SegmentationDataset(root, image_size=tuple(image_size)), batch_size=batch_size, shuffle=True)


@register_dataloader("segmentation_val")
@register_dataloader("cityscapes_stdc_seg50_val")
def segmentation_val(root: str, batch_size: int = 8, image_size=(512, 1024), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import SegmentationDataset

    return DataLoader(SegmentationDataset(root, image_size=tuple(image_size)), batch_size=batch_size, shuffle=False, drop_last=False)
