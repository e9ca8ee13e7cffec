"""Dataloader adapters: wrap arbitrary datasets/loaders into SG-TPU batch format.

Reference: ``training/dataloaders/adapters.py`` (BaseDataloaderAdapterFactory +
per-task factories). The reference delegates schema inference to the external
``data_gradients`` service; here adaptation is structural and local — samples are
inspected once and converted to the framework's static-shape conventions:

- classification: ``(image NHWC float32, label int32)``
- detection:      ``(images [B,H,W,3] float32, targets [B,max_boxes,5])`` with
                  rows ``(cls, x1, y1, x2, y2)`` and ``-1`` padding
                  (the PPYoloELoss target contract)
- segmentation:   ``(images [B,H,W,3] float32, masks [B,H,W] int32)``

Channel-first (CHW) images are transposed to channels-last automatically; torch
tensors are accepted and converted to numpy.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence

import numpy as np


def _to_numpy(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _ensure_hwc(img: np.ndarray) -> np.ndarray:
    """Heuristic CHW→HWC: channel dim is the one with size ≤ 4."""
    img = _to_numpy(img)
    if img.ndim == 3 and img.shape[0] <= 4 < img.shape[-1]:
        img = img.transpose(1, 2, 0)
    return img.astype(np.float32)


def adapt_classification_sample(sample) -> tuple:
    img, label = sample[0], sample[1]
    return _ensure_hwc(img), np.int32(_to_numpy(label))


def adapt_detection_sample(sample, max_boxes: int = 100) -> tuple:
    """(image, boxes-ish) → (image HWC, targets [max_boxes, 5] cls,x1,y1,x2,y2; -1 pad).

    Accepts boxes as [N, 5] (cls first or last — inferred from value ranges),
    or separate (boxes [N, 4], labels [N]).
    """
    img = _ensure_hwc(sample[0])
    rest = sample[1:]
    if len(rest) == 2:
        boxes, labels = _to_numpy(rest[0]).reshape(-1, 4), _to_numpy(rest[1]).reshape(-1)
        rows = np.concatenate([labels[:, None].astype(np.float32), boxes.astype(np.float32)], axis=1)
    else:
        arr = _to_numpy(rest[0]).reshape(-1, 5).astype(np.float32)
        if arr.shape[0] and _looks_like_class_column(arr[:, 4]) and not _looks_like_class_column(arr[:, 0]):
            arr = arr[:, [4, 0, 1, 2, 3]]  # boxes-first layout -> cls-first
        rows = arr
    out = np.full((max_boxes, 5), -1.0, np.float32)
    n = min(len(rows), max_boxes)
    out[:n] = rows[:n]
    return img, out


def _looks_like_class_column(col: np.ndarray) -> bool:
    return bool(np.all(col == np.round(col)) and col.max(initial=0) < 1000 and col.min(initial=0) >= 0)


def adapt_segmentation_sample(sample) -> tuple:
    img = _ensure_hwc(sample[0])
    mask = _to_numpy(sample[1])
    if mask.ndim == 3:
        mask = mask[0] if mask.shape[0] == 1 else mask[..., 0]
    return img, mask.astype(np.int32)


class BaseDataloaderAdapterFactory:
    """ref adapters.py:19 — wrap a dataset or loader so batches come out in
    SG-TPU format. Subclasses pick the per-sample adapter."""

    _adapt: Callable = staticmethod(adapt_classification_sample)

    @classmethod
    def from_dataset(cls, dataset, batch_size: int = 8, drop_last: bool = True, **adapter_kwargs):
        from super_gradients_tpu.training.dataloaders import DataLoader

        class _Adapted:
            def __len__(self_inner):
                return len(dataset)

            def __getitem__(self_inner, i):
                return cls._adapt(dataset[i], **adapter_kwargs)

        return DataLoader(_Adapted(), batch_size=batch_size, drop_last=drop_last)

    @classmethod
    def from_dataloader(cls, dataloader: Iterable, **adapter_kwargs):
        """Yield re-adapted batches from an existing loader (generator wrapper)."""

        def gen():
            for batch in dataloader:
                images, *rest = batch
                images = _to_numpy(images)
                per_sample = [cls._adapt((images[i], *[_to_numpy(r)[i] for r in rest]), **adapter_kwargs)
                              for i in range(len(images))]
                cols = list(zip(*per_sample))
                yield tuple(np.stack(c) for c in cols)

        return gen()


class ClassificationDataloaderAdapterFactory(BaseDataloaderAdapterFactory):
    _adapt = staticmethod(adapt_classification_sample)


class DetectionDataloaderAdapterFactory(BaseDataloaderAdapterFactory):
    _adapt = staticmethod(adapt_detection_sample)


class SegmentationDataloaderAdapterFactory(BaseDataloaderAdapterFactory):
    _adapt = staticmethod(adapt_segmentation_sample)
