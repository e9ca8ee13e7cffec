"""Albumentations pipeline adapter (gated — the library is optional).

Reference: ``training/transforms/pipeline_adaptors.py`` (AlbumentationsAdaptor) —
wraps an ``A.Compose`` so it can sit inside our transform chains. Detection samples
convert boxes to pascal_voc (xyxy) for albumentations and back; segmentation samples
pass ``mask=``; plain images pass ``image=`` only.

If ``albumentations`` is not installed, constructing the adapter raises ImportError
with install guidance (reference behavior: lazy import inside the factory).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Optional, Union

import numpy as np

from super_gradients_tpu.common.registry import register_transform
from super_gradients_tpu.training.transforms.detection import DetectionSample
from super_gradients_tpu.training.transforms.segmentation import SegSample


def _require_albumentations():
    try:
        import albumentations as A  # noqa: F401

        return A
    except ImportError as e:
        raise ImportError(
            "albumentations is not installed in this environment; the Albumentations "
            "adapter requires it (`pip install albumentations`)"
        ) from e


def compose_from_config(A, config: Mapping) -> Callable:
    """Build A.Compose from a recipe dict {"Compose": {"transforms": [{Name: params}, ...]}}."""
    if "Compose" in config:
        config = config["Compose"]
    transforms = []
    for entry in config.get("transforms", []):
        (name, params), = entry.items() if isinstance(entry, Mapping) else ((entry, {}),)
        transforms.append(getattr(A, name)(**(params or {})))
    kwargs = {}
    if config.get("bbox_params"):
        kwargs["bbox_params"] = A.BboxParams(**config["bbox_params"])
    if config.get("keypoint_params"):
        kwargs["keypoint_params"] = A.KeypointParams(**config["keypoint_params"])
    return A.Compose(transforms, **kwargs)


@register_transform("Albumentations")
class AlbumentationsAdaptor:
    """Wrap an albumentations Compose (or recipe dict) as a sample transform."""

    def __init__(self, composed_transforms: Optional[Callable] = None, config: Optional[Mapping] = None):
        A = _require_albumentations()
        if composed_transforms is None:
            if config is None:
                raise ValueError("pass either composed_transforms or a config dict")
            composed_transforms = compose_from_config(A, config)
        self.composed = composed_transforms

    def __call__(self, sample: Union[np.ndarray, DetectionSample, SegSample, Any]):
        if isinstance(sample, SegSample):
            out = self.composed(image=np.clip(sample.image, 0, 255).astype(np.uint8), mask=sample.mask)
            return SegSample(out["image"].astype(np.float32), out["mask"].astype(np.int32))
        if isinstance(sample, DetectionSample):
            out = self.composed(
                image=np.clip(sample.image, 0, 255).astype(np.uint8),
                bboxes=[tuple(b) for b in sample.bboxes_xyxy],
                labels=list(sample.labels),
            )
            new_boxes = np.asarray(out.get("bboxes", []), np.float32).reshape(-1, 4)
            new_labels = np.asarray(out.get("labels", []), np.int32)
            return DetectionSample(image=out["image"].astype(np.float32), bboxes_xyxy=new_boxes, labels=new_labels)
        # plain image (classification)
        out = self.composed(image=np.clip(np.asarray(sample), 0, 255).astype(np.uint8))
        return out["image"].astype(np.float32)
