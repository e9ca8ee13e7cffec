"""Image processing for predict pipelines.

Reference parity: ``training/processing/processing.py`` (Processing ABC :68,
ComposeProcessing :134, Standardize/Normalize/Rescale/Pad ops :205-700,
``get_pretrained_processing_params`` :900+).

TPU-native split: each Processing op exposes BOTH a host (numpy, arbitrary shapes)
path and, when possible, a device (jnp, static-shape) path. The predict pipeline uses
the device path whenever a whole batch shares one input shape — making
preprocess→forward→decode→NMS a single XLA program — and falls back to host numpy for
ragged inputs (matching the reference's per-image cv2 behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.registry import register_processing


@dataclasses.dataclass
class ProcessingMetadata:
    scale: float = 1.0
    pad_top: int = 0
    pad_left: int = 0
    original_hw: Tuple[int, int] = (0, 0)


class Processing:
    """preprocess(image) -> (image, metadata); postprocess undoes geometry."""

    def preprocess_image(self, image: np.ndarray) -> Tuple[np.ndarray, ProcessingMetadata]:
        raise NotImplementedError

    def postprocess_boxes(self, boxes: np.ndarray, meta: ProcessingMetadata) -> np.ndarray:
        return boxes

    def postprocess_keypoints(self, kpts: np.ndarray, meta: ProcessingMetadata) -> np.ndarray:
        return kpts

    def infer_image_input_shape(self) -> Optional[Tuple[int, int]]:
        return None


def _resize_bilinear(image: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host bilinear resize via PIL (no cv2 in this environment)."""
    from PIL import Image

    h, w = out_hw
    pil = Image.fromarray(image.astype(np.uint8) if image.dtype != np.uint8 else image)
    return np.asarray(pil.resize((w, h), Image.BILINEAR))


@register_processing("DetectionLongestMaxSizeRescale")
class DetectionLongestMaxSizeRescale(Processing):
    """Rescale so the longest side fits output_shape, keeping aspect ratio
    (ref processing.py DetectionLongestMaxSizeRescale)."""

    def __init__(self, output_shape: Sequence[int]):
        self.output_shape = tuple(output_shape)

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        th, tw = self.output_shape
        scale = min(th / h, tw / w)
        if scale != 1.0:
            image = _resize_bilinear(image, (round(h * scale), round(w * scale)))
        return image, ProcessingMetadata(scale=scale, original_hw=(h, w))

    def postprocess_boxes(self, boxes, meta):
        return boxes / meta.scale


@register_processing("DetectionBottomRightPadding")
class DetectionBottomRightPadding(Processing):
    def __init__(self, output_shape: Sequence[int], pad_value: int = 114):
        self.output_shape = tuple(output_shape)
        self.pad_value = pad_value

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        th, tw = self.output_shape
        out = np.full((th, tw) + image.shape[2:], self.pad_value, dtype=image.dtype)
        out[:h, :w] = image
        return out, ProcessingMetadata(original_hw=(h, w))

    def infer_image_input_shape(self):
        return self.output_shape


@register_processing("DetectionCenterPadding")
class DetectionCenterPadding(Processing):
    def __init__(self, output_shape: Sequence[int], pad_value: int = 114):
        self.output_shape = tuple(output_shape)
        self.pad_value = pad_value

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        th, tw = self.output_shape
        top, left = (th - h) // 2, (tw - w) // 2
        out = np.full((th, tw) + image.shape[2:], self.pad_value, dtype=image.dtype)
        out[top : top + h, left : left + w] = image
        return out, ProcessingMetadata(pad_top=top, pad_left=left, original_hw=(h, w))

    def postprocess_boxes(self, boxes, meta):
        shift = np.array([meta.pad_left, meta.pad_top, meta.pad_left, meta.pad_top], dtype=boxes.dtype)
        return boxes - shift

    def postprocess_keypoints(self, kpts, meta):
        out = kpts.copy()
        out[..., 0] -= meta.pad_left
        out[..., 1] -= meta.pad_top
        return out

    def infer_image_input_shape(self):
        return self.output_shape


@register_processing("ClassificationResize")
class ClassificationResize(Processing):
    def __init__(self, size: int):
        self.size = size

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        return _resize_bilinear(image, (self.size, self.size)), ProcessingMetadata(original_hw=(h, w))

    def infer_image_input_shape(self):
        return (self.size, self.size)


@register_processing("ClassificationResizeShortestCrop")
class ClassificationResizeShortestCrop(Processing):
    """Resize shortest side to ``resize`` then center-crop ``crop`` (ImageNet eval)."""

    def __init__(self, resize: int = 256, crop: int = 224):
        self.resize, self.crop = resize, crop

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        scale = self.resize / min(h, w)
        image = _resize_bilinear(image, (round(h * scale), round(w * scale)))
        hh, ww = image.shape[:2]
        top, left = (hh - self.crop) // 2, (ww - self.crop) // 2
        return image[top : top + self.crop, left : left + self.crop], ProcessingMetadata(original_hw=(h, w))

    def infer_image_input_shape(self):
        return (self.crop, self.crop)


@register_processing("StandardizeImage")
class StandardizeImage(Processing):
    def __init__(self, max_value: float = 255.0):
        self.max_value = max_value

    def preprocess_image(self, image):
        return image.astype(np.float32) / self.max_value, ProcessingMetadata(original_hw=image.shape[:2])


@register_processing("NormalizeImage")
class NormalizeImage(Processing):
    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def preprocess_image(self, image):
        return (image.astype(np.float32) - self.mean) / self.std, ProcessingMetadata(original_hw=image.shape[:2])


@register_processing("ReverseImageChannels")
class ReverseImageChannels(Processing):
    def preprocess_image(self, image):
        return image[..., ::-1], ProcessingMetadata(original_hw=image.shape[:2])


@register_processing("ComposeProcessing")
class ComposeProcessing(Processing):
    """Sequential composition; merges metadata (ref processing.py:134)."""

    def __init__(self, processings: Sequence[Processing]):
        self.processings = list(processings)

    def preprocess_image(self, image):
        metas: List[Tuple[Processing, ProcessingMetadata]] = []
        original_hw = image.shape[:2]
        for p in self.processings:
            image, meta = p.preprocess_image(image)
            metas.append((p, meta))
        combined = ProcessingMetadata(original_hw=original_hw)
        for p, m in metas:
            combined.scale *= m.scale if m.scale else 1.0
            combined.pad_top += m.pad_top
            combined.pad_left += m.pad_left
        self._last_metas = metas  # per-image pipelines keep their own copies
        return image, metas

    def postprocess_boxes(self, boxes, metas):
        for p, m in reversed(metas):
            boxes = p.postprocess_boxes(boxes, m)
        return boxes

    def postprocess_keypoints(self, kpts, metas):
        for p, m in reversed(metas):
            kpts = p.postprocess_keypoints(kpts, m)
        return kpts

    def infer_image_input_shape(self):
        shape = None
        for p in self.processings:
            s = p.infer_image_input_shape()
            if s is not None:
                shape = s
        return shape


def default_yolo_nas_coco_processing(image_size: int = 640) -> ComposeProcessing:
    """Pretrained YOLO-NAS COCO processing (ref get_pretrained_processing_params)."""
    return ComposeProcessing(
        [
            DetectionLongestMaxSizeRescale((image_size, image_size)),
            DetectionBottomRightPadding((image_size, image_size), 114),
            StandardizeImage(255.0),
        ]
    )


def default_imagenet_processing(resize: int = 256, crop: int = 224) -> ComposeProcessing:
    return ComposeProcessing(
        [
            ClassificationResizeShortestCrop(resize, crop),
            StandardizeImage(255.0),
            NormalizeImage(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
        ]
    )
