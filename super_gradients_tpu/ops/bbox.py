"""Bounding-box ops: format conversions, IoU families, distance decode.

Replaces the reference's bbox-format registry + torch IoU utilities
(``training/datasets/data_formats/bbox_formats/*`` and
``training/utils/detection_utils.py``) with pure, jittable, batched jnp functions.
All functions accept arbitrary leading batch dims; boxes are float arrays ``[..., 4]``.

Formats: ``xyxy`` (x1,y1,x2,y2), ``cxcywh`` (center x/y, w, h), ``xywh`` (top-left x/y,
w, h), ``yxyx``; ``normalized_*`` variants divide by image size.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------- conversions


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xyxy_to_yxyx(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([y1, x1, y2, x2], axis=-1)


yxyx_to_xyxy = xyxy_to_yxyx  # involution


def cxcywh_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    return xyxy_to_xywh(cxcywh_to_xyxy(boxes))


def xywh_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    return xyxy_to_cxcywh(xywh_to_xyxy(boxes))


def normalize_boxes(boxes: jnp.ndarray, image_hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = image_hw
    scale = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return boxes / scale


def denormalize_boxes(boxes: jnp.ndarray, image_hw: Tuple[int, int]) -> jnp.ndarray:
    h, w = image_hw
    scale = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return boxes * scale


_CONVERTERS: Dict[Tuple[str, str], Callable] = {
    ("xyxy", "cxcywh"): xyxy_to_cxcywh,
    ("cxcywh", "xyxy"): cxcywh_to_xyxy,
    ("xywh", "xyxy"): xywh_to_xyxy,
    ("xyxy", "xywh"): xyxy_to_xywh,
    ("xyxy", "yxyx"): xyxy_to_yxyx,
    ("yxyx", "xyxy"): yxyx_to_xyxy,
    ("cxcywh", "xywh"): cxcywh_to_xywh,
    ("xywh", "cxcywh"): xywh_to_cxcywh,
}


def convert_bboxes(boxes: jnp.ndarray, src: str, dst: str) -> jnp.ndarray:
    """Convert between any two supported formats (via xyxy if needed).

    Reference parity: ``data_formats/bbox_formats`` registry +
    ``format_converter.py:12``.
    """
    if src == dst:
        return boxes
    if (src, dst) in _CONVERTERS:
        return _CONVERTERS[(src, dst)](boxes)
    to_xyxy = _CONVERTERS[(src, "xyxy")]
    from_xyxy = _CONVERTERS[("xyxy", dst)]
    return from_xyxy(to_xyxy(boxes))


# ---------------------------------------------------------------------- areas


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, clamped at 0."""
    w = jnp.clip(boxes[..., 2] - boxes[..., 0], 0)
    h = jnp.clip(boxes[..., 3] - boxes[..., 1], 0)
    return w * h


# ------------------------------------------------------------------- IoU math
# Pairwise matrices: boxes1 [..., N, 4] x boxes2 [..., M, 4] -> [..., N, M].
# These lower to a handful of fused VPU ops under XLA; no Pallas needed.


def _pairwise_intersection(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Pairwise IoU matrix for xyxy boxes (``detection_utils.py`` IoU analogue)."""
    inter = _pairwise_intersection(boxes1, boxes2)
    union = box_area(boxes1)[..., :, None] + box_area(boxes2)[..., None, :] - inter
    return inter / (union + eps)


def box_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Pairwise Generalized IoU matrix."""
    inter = _pairwise_intersection(boxes1, boxes2)
    union = box_area(boxes1)[..., :, None] + box_area(boxes2)[..., None, :] - inter
    iou = inter / (union + eps)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    enclose = wh[..., 0] * wh[..., 1]
    return iou - (enclose - union) / (enclose + eps)


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Aligned IoU: boxes1 and boxes2 have the same shape [..., 4] -> [...]."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return inter / (union + eps)


def elementwise_giou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Aligned GIoU (loss form used by ``GIoULoss``, ref ``ppyolo_loss.py:564``)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    iou = inter / (union + eps)
    elt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    erb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    ewh = jnp.clip(erb - elt, 0)
    enclose = ewh[..., 0] * ewh[..., 1]
    return iou - (enclose - union) / (enclose + eps)


def elementwise_ciou(boxes1: jnp.ndarray, boxes2: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Aligned Complete-IoU (used by YoloX / pose losses)."""
    iou = elementwise_iou(boxes1, boxes2, eps)
    c1 = xyxy_to_cxcywh(boxes1)
    c2 = xyxy_to_cxcywh(boxes2)
    center_dist = jnp.sum((c1[..., :2] - c2[..., :2]) ** 2, axis=-1)
    elt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    erb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    diag = jnp.sum((erb - elt) ** 2, axis=-1)
    v = (4 / (jnp.pi**2)) * (
        jnp.arctan(c1[..., 2] / (c1[..., 3] + eps)) - jnp.arctan(c2[..., 2] / (c2[..., 3] + eps))
    ) ** 2
    alpha = v / (1 - iou + v + eps)
    alpha = jax.lax.stop_gradient(alpha)
    return iou - center_dist / (diag + eps) - alpha * v


# -------------------------------------------------------------- anchor decode


def batch_distance2bbox(points: jnp.ndarray, distance: jnp.ndarray) -> jnp.ndarray:
    """Decode (l, t, r, b) distances from anchor points into xyxy boxes.

    Reference parity: ``yolo_nas/dfl_heads.py`` / ``pp_yolo_head`` decode
    (``batch_distance2bbox``). points: [..., A, 2] (x, y); distance: [..., A, 4].
    """
    lt = distance[..., :2]
    rb = distance[..., 2:]
    x1y1 = points - lt
    x2y2 = points + rb
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def batch_bbox2distance(points: jnp.ndarray, bbox: jnp.ndarray, reg_max: float | None = None, eps: float = 0.01) -> jnp.ndarray:
    """Inverse of :func:`batch_distance2bbox`; optionally clipped to reg_max (DFL targets)."""
    lt = points - bbox[..., :2]
    rb = bbox[..., 2:] - points
    dist = jnp.concatenate([lt, rb], axis=-1)
    if reg_max is not None:
        dist = jnp.clip(dist, 0, reg_max - eps)
    return dist
