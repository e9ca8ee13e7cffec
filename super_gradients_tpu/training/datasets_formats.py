"""Bbox format registry + target-format transform + detection output adapter.

Reference: ``training/datasets/data_formats/`` — bbox_formats registry (8 files),
``ConcatenatedTensorFormatConverter`` (format_converter.py:12), declarative
``ConcatenatedTensorFormat`` schemas (formats.py / default_formats.py),
``DetectionTargetsFormatTransform`` (transforms.py:1259) and
``DetectionOutputAdapter`` (output_adapters/detection_adapter.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.registry import register_transform
from super_gradients_tpu.ops import bbox as bbox_ops

#: registered bbox coordinate formats (reference bbox_formats registry)
BBOX_FORMATS = ("xyxy", "xywh", "cxcywh", "yxyx", "normalized_xyxy", "normalized_xywh", "normalized_cxcywh")


def convert_bboxes(boxes: np.ndarray, image_shape: Optional[Tuple[int, int]], source_format: str, target_format: str) -> np.ndarray:
    """Numpy/ jnp format conversion incl. normalized variants.

    image_shape (h, w) required when normalizing/denormalizing.
    """
    import jax.numpy as jnp

    src_norm = source_format.startswith("normalized_")
    dst_norm = target_format.startswith("normalized_")
    src = source_format.replace("normalized_", "")
    dst = target_format.replace("normalized_", "")
    out = jnp.asarray(boxes)
    if src_norm:
        out = bbox_ops.convert_bboxes(out, src, "xyxy")
        out = bbox_ops.denormalize_boxes(out, image_shape)
        out = bbox_ops.convert_bboxes(out, "xyxy", dst)
    else:
        out = bbox_ops.convert_bboxes(out, src, dst)
    if dst_norm:
        out = bbox_ops.convert_bboxes(out, dst, "xyxy")
        out = bbox_ops.normalize_boxes(out, image_shape)
        out = bbox_ops.convert_bboxes(out, "xyxy", dst)
    return np.asarray(out)


@dataclasses.dataclass(frozen=True)
class ConcatenatedTensorFormat:
    """Declarative layout of a concatenated target row (ref formats.py).

    layout: ordered (name, length) pairs; ``bboxes_format`` names the coordinate
    format of the 'bboxes' field.
    """

    layout: Tuple[Tuple[str, int], ...]
    bboxes_format: str = "xyxy"

    def slices(self) -> Dict[str, slice]:
        out, i = {}, 0
        for name, ln in self.layout:
            out[name] = slice(i, i + ln)
            i += ln
        return out

    @property
    def num_channels(self) -> int:
        return sum(ln for _, ln in self.layout)


LABEL_XYXY = ConcatenatedTensorFormat((("labels", 1), ("bboxes", 4)), "xyxy")
LABEL_CXCYWH = ConcatenatedTensorFormat((("labels", 1), ("bboxes", 4)), "cxcywh")
LABEL_NORMALIZED_XYXY = ConcatenatedTensorFormat((("labels", 1), ("bboxes", 4)), "normalized_xyxy")
XYXY_LABEL = ConcatenatedTensorFormat((("bboxes", 4), ("labels", 1)), "xyxy")


class ConcatenatedTensorFormatConverter:
    """Rearranges + converts concatenated target tensors (ref format_converter.py:12)."""

    def __init__(self, input_format: ConcatenatedTensorFormat, output_format: ConcatenatedTensorFormat, image_shape: Optional[Tuple[int, int]] = None):
        self.input_format = input_format
        self.output_format = output_format
        self.image_shape = image_shape

    def __call__(self, targets: np.ndarray) -> np.ndarray:
        in_slices = self.input_format.slices()
        fields = {name: targets[..., sl] for name, sl in in_slices.items()}
        if "bboxes" in fields and self.input_format.bboxes_format != self.output_format.bboxes_format:
            fields["bboxes"] = convert_bboxes(
                fields["bboxes"], self.image_shape, self.input_format.bboxes_format, self.output_format.bboxes_format
            )
        return np.concatenate([fields[name] for name, _ in self.output_format.layout], axis=-1)


@register_transform("DetectionTargetsFormatTransform")
class DetectionTargetsFormatTransform:
    """Sample-level target format conversion (ref transforms.py:1259)."""

    additional_samples_count = 0

    def __init__(self, input_dim=None, input_format: ConcatenatedTensorFormat = XYXY_LABEL, output_format: ConcatenatedTensorFormat = LABEL_CXCYWH):
        self.converter = ConcatenatedTensorFormatConverter(input_format, output_format, input_dim)

    def __call__(self, sample, additional=()):
        return sample  # DetectionSample pipeline keeps xyxy natively; kept for API parity


class DetectionOutputAdapter:
    """Rearrange NMSOutput into a declared concatenated layout (ref detection_adapter.py).

    Useful for serving pipelines expecting the reference's FLAT [N, 7] rows
    (batch_idx, x1, y1, x2, y2, score, label).
    """

    def __init__(self, output_format: str = "flat"):
        self.output_format = output_format

    def __call__(self, nms_out) -> np.ndarray:
        boxes = np.asarray(nms_out.boxes)
        scores = np.asarray(nms_out.scores)
        labels = np.asarray(nms_out.labels)
        nums = np.asarray(nms_out.num_detections)
        if self.output_format == "batched":
            return np.concatenate([boxes, scores[..., None], labels[..., None].astype(boxes.dtype)], axis=-1)
        rows = []
        for b in range(boxes.shape[0]):
            n = int(nums[b])
            if n:
                rows.append(
                    np.concatenate(
                        [np.full((n, 1), b, boxes.dtype), boxes[b, :n], scores[b, :n, None], labels[b, :n, None].astype(boxes.dtype)],
                        axis=1,
                    )
                )
        return np.concatenate(rows) if rows else np.zeros((0, 7), boxes.dtype)
