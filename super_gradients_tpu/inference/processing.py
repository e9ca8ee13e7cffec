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
    # per-axis scale for non-aspect-preserving rescales (ref RescaleMetadata
    # scale_factor_h/scale_factor_w); None -> use the uniform ``scale``
    scale_h: Optional[float] = None
    scale_w: Optional[float] = None
    # symmetric-padding bottom/right (ref PaddingCoordinates); pad_top/pad_left above
    pad_bottom: int = 0
    pad_right: int = 0


class Processing:
    """preprocess(image) -> (image, metadata); postprocess undoes geometry."""

    def preprocess_image(self, image: np.ndarray) -> Tuple[np.ndarray, ProcessingMetadata]:
        raise NotImplementedError

    def postprocess_boxes(self, boxes: np.ndarray, meta: ProcessingMetadata) -> np.ndarray:
        return boxes

    def postprocess_keypoints(self, kpts: np.ndarray, meta: ProcessingMetadata) -> np.ndarray:
        return kpts

    def postprocess_segmentation(self, seg_map: np.ndarray, meta: ProcessingMetadata) -> np.ndarray:
        return seg_map

    def infer_image_input_shape(self) -> Optional[Tuple[int, int]]:
        return None

    def get_equivalent_photometric_fn(self):
        """jnp-traceable equivalent of this op's PHOTOMETRIC effect, or None for
        geometric ops (ref processing.py:87 get_equivalent_photometric_module —
        used to bake standardize/normalize/BGR into the exported graph)."""
        return None


def _resize_bilinear(image: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host bilinear resize — cv2 INTER_LINEAR to match the reference's kernel
    exactly (ref transforms/utils.py:25 ``_rescale_image``; PIL's BILINEAR
    antialiases on downscale and diverges pixel-wise), PIL fallback."""
    h, w = out_hw
    try:
        import cv2

        return cv2.resize(image, dsize=(w, h), interpolation=cv2.INTER_LINEAR)
    except ImportError:
        from PIL import Image

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

    def postprocess_keypoints(self, kpts, meta):
        out = kpts.copy()
        out[..., :2] = out[..., :2] / meta.scale
        return out


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


@register_processing("KeypointsLongestMaxSizeRescale")
class KeypointsLongestMaxSizeRescale(DetectionLongestMaxSizeRescale):
    """Alias with keypoint postprocess (ref processing.py:591) — geometry identical."""


@register_processing("KeypointsBottomRightPadding")
class KeypointsBottomRightPadding(DetectionBottomRightPadding):
    """Bottom-right pad for pose inputs (ref processing.py:437; pad_value=127)."""

    def __init__(self, output_shape: Sequence[int], pad_value: int = 127):
        super().__init__(output_shape, pad_value)


@register_processing("DetectionRescale")
class DetectionRescale(Processing):
    """Direct (non-aspect-preserving) resize to output_shape
    (ref processing.py:577 DetectionRescale / _Rescale:514-524)."""

    def __init__(self, output_shape: Sequence[int]):
        self.output_shape = tuple(output_shape)

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        th, tw = self.output_shape
        out = _resize_bilinear(image, (th, tw)) if (h, w) != (th, tw) else image
        return out, ProcessingMetadata(original_hw=(h, w), scale_h=th / h, scale_w=tw / w)

    def postprocess_boxes(self, boxes, meta):
        sc = np.array([meta.scale_w, meta.scale_h, meta.scale_w, meta.scale_h], dtype=np.float32)
        return boxes / sc

    def postprocess_keypoints(self, kpts, meta):
        out = kpts.copy()
        out[..., 0] = out[..., 0] / meta.scale_w
        out[..., 1] = out[..., 1] / meta.scale_h
        return out

    def infer_image_input_shape(self):
        return self.output_shape


@register_processing("KeypointsRescale")
class KeypointsRescale(DetectionRescale):
    """Alias (ref processing.py KeypointsRescale) — same per-axis geometry."""


def _resize_nearest(seg: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(seg.astype(np.uint8), dsize=(out_hw[1], out_hw[0]), interpolation=cv2.INTER_NEAREST)
    except ImportError:
        from PIL import Image

        return np.asarray(Image.fromarray(seg.astype(np.uint8)).resize((out_hw[1], out_hw[0]), Image.NEAREST))


@register_processing("SegmentationResizeWithPadding")
class SegmentationResizeWithPadding(Processing):
    """Aspect-preserving resize + center pad to output_shape; postprocess crops the
    padding then NEAREST-resizes the class map back (ref processing.py:690)."""

    def __init__(self, output_shape: Sequence[int], pad_value: int = 0):
        self.output_shape = tuple(output_shape)
        self.pad_value = pad_value

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        th, tw = self.output_shape
        scale = min(th / h, tw / w)
        if scale != 1.0:
            image = _resize_bilinear(image, (round(h * scale), round(w * scale)))
        hh, ww = image.shape[:2]
        top, left = (th - hh) // 2, (tw - ww) // 2
        out = np.full((th, tw) + image.shape[2:], self.pad_value, dtype=image.dtype)
        out[top : top + hh, left : left + ww] = image
        return out, ProcessingMetadata(
            scale=scale, original_hw=(h, w), pad_top=top, pad_left=left,
            pad_bottom=th - hh - top, pad_right=tw - ww - left,
        )

    def postprocess_segmentation(self, seg_map, meta):
        h, w = seg_map.shape[:2]
        seg = seg_map[meta.pad_top : h - meta.pad_bottom, meta.pad_left : w - meta.pad_right]
        return _resize_nearest(seg, meta.original_hw)

    def infer_image_input_shape(self):
        return self.output_shape


@register_processing("SegmentationRescale")
class SegmentationRescale(Processing):
    """Rescale by scale_factor | short_size | long_size, preserving aspect ratio
    (ref processing.py:744)."""

    def __init__(self, scale_factor: Optional[float] = None, short_size: Optional[int] = None, long_size: Optional[int] = None):
        self.scale_factor, self.short_size, self.long_size = scale_factor, short_size, long_size

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        if self.scale_factor is not None:
            scale = float(self.scale_factor)
        elif self.short_size is not None:
            scale = self.short_size / min(h, w)
        else:
            scale = self.long_size / max(h, w)
        out = _resize_bilinear(image, (int(scale * h), int(scale * w))) if scale != 1.0 else image
        return out, ProcessingMetadata(scale=scale, original_hw=(h, w))

    def postprocess_segmentation(self, seg_map, meta):
        return _resize_nearest(seg_map, meta.original_hw)

    def infer_image_input_shape(self):
        return (self.long_size, self.long_size) if self.long_size is not None else None


@register_processing("SegmentationResize")
class SegmentationResize(Processing):
    """Direct resize to output_shape (ref processing.py SegmentationResize)."""

    def __init__(self, output_shape: Sequence[int]):
        self.output_shape = tuple(output_shape)

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        return _resize_bilinear(image, self.output_shape), ProcessingMetadata(original_hw=(h, w))

    def postprocess_segmentation(self, seg_map, meta):
        return _resize_nearest(seg_map, meta.original_hw)

    def infer_image_input_shape(self):
        return self.output_shape


@register_processing("SegmentationPadShortToCropSize")
class SegmentationPadShortToCropSize(Processing):
    """Center-pad image up to crop_size (ref processing.py:832)."""

    def __init__(self, crop_size, fill_image=0):
        self.crop_size = (crop_size, crop_size) if isinstance(crop_size, (int, float)) else tuple(crop_size)
        self.fill_image = fill_image

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        th, tw = max(h, int(self.crop_size[0])), max(w, int(self.crop_size[1]))
        top, left = (th - h) // 2, (tw - w) // 2
        out = np.full((th, tw) + image.shape[2:], self.fill_image, dtype=image.dtype)
        out[top : top + h, left : left + w] = image
        return out, ProcessingMetadata(
            original_hw=(h, w), pad_top=top, pad_left=left, pad_bottom=th - h - top, pad_right=tw - w - left
        )

    def postprocess_segmentation(self, seg_map, meta):
        h, w = seg_map.shape[:2]
        return seg_map[meta.pad_top : h - meta.pad_bottom, meta.pad_left : w - meta.pad_right]

    def infer_image_input_shape(self):
        return self.crop_size


@register_processing("SegmentationPadToDivisible")
class SegmentationPadToDivisible(Processing):
    """Bottom-right pad to a multiple of divisible_value (ref processing.py SegmentationPadToDivisible)."""

    def __init__(self, divisible_value: int, fill_image=0):
        self.divisible_value = int(divisible_value)
        self.fill_image = fill_image

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        d = self.divisible_value
        th, tw = -(-h // d) * d, -(-w // d) * d
        out = np.full((th, tw) + image.shape[2:], self.fill_image, dtype=image.dtype)
        out[:h, :w] = image
        return out, ProcessingMetadata(original_hw=(h, w), pad_bottom=th - h, pad_right=tw - w)

    def postprocess_segmentation(self, seg_map, meta):
        h, w = seg_map.shape[:2]
        return seg_map[: h - meta.pad_bottom, : w - meta.pad_right]


@register_processing("Resize")
class Resize(Processing):
    """Shortest-side-covering resize to a square target (ref processing.py:614 —
    scale = max(size/h, size/w), classification eval pipelines)."""

    def __init__(self, size: int = 224):
        self.size = int(size)

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        scale = max(self.size / h, self.size / w)
        if scale != 1.0:
            image = _resize_bilinear(image, (int(h * scale), int(w * scale)))
        return image, ProcessingMetadata(scale=scale, original_hw=(h, w))


@register_processing("CenterCrop")
class CenterCrop(Processing):
    """Center crop to size x size (ref processing.py:647)."""

    def __init__(self, size: int = 224):
        self.size = int(size)

    def preprocess_image(self, image):
        h, w = image.shape[:2]
        top, left = (h - self.size) // 2, (w - self.size) // 2
        return image[top : top + self.size, left : left + self.size], ProcessingMetadata(original_hw=(h, w))

    def infer_image_input_shape(self):
        return (self.size, self.size)


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

    def get_equivalent_photometric_fn(self):
        max_value = self.max_value
        return lambda x: x / max_value


@register_processing("NormalizeImage")
class NormalizeImage(Processing):
    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def preprocess_image(self, image):
        return (image.astype(np.float32) - self.mean) / self.std, ProcessingMetadata(original_hw=image.shape[:2])

    def get_equivalent_photometric_fn(self):
        mean, std = self.mean.copy(), self.std.copy()
        return lambda x: (x - mean) / std


@register_processing("ReverseImageChannels")
class ReverseImageChannels(Processing):
    def preprocess_image(self, image):
        return image[..., ::-1], ProcessingMetadata(original_hw=image.shape[:2])

    def get_equivalent_photometric_fn(self):
        return lambda x: x[..., ::-1]


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

    def postprocess_segmentation(self, seg_map, metas):
        for p, m in reversed(metas):
            seg_map = p.postprocess_segmentation(seg_map, m)
        return seg_map

    def infer_image_input_shape(self):
        shape = None
        for p in self.processings:
            s = p.infer_image_input_shape()
            if s is not None:
                shape = s
        return shape

    def get_equivalent_photometric_fn(self):
        """Compose the photometric members in order (geometric ops contribute
        identity) — the in-graph preprocessing for exported artifacts
        (ref processing.py:87)."""
        # getattr-guarded: model specs may attach duck-typed processing ops that
        # predate this interface
        fns = [
            f
            for f in (getattr(p, "get_equivalent_photometric_fn", lambda: None)() for p in self.processings)
            if f is not None
        ]
        if not fns:
            return None

        def composed(x):
            for f in fns:
                x = f(x)
            return x

        return composed


def default_yolo_nas_coco_processing(image_size: int = 640) -> ComposeProcessing:
    """Pretrained YOLO-NAS COCO processing (ref default_yolo_nas_coco_processing_params,
    processing.py:960: LongestMaxSizeRescale(636,636) + CenterPadding(640,640) — the
    geometry the published COCO checkpoints were evaluated with)."""
    return ComposeProcessing(
        [
            DetectionLongestMaxSizeRescale((image_size - 4, image_size - 4)),
            DetectionCenterPadding((image_size, image_size), 114),
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


# --------------------------------------------------------------------------- #
# Per-pretrained-model processing params                                       #
# (ref processing.py:914-1240 default_*_processing_params +                    #
#  get_pretrained_processing_params)                                           #
# --------------------------------------------------------------------------- #

# COCO-pose skeleton + draw colors (ref default_dekr_coco_processing_params:983)
COCO_POSE_DEFAULT_EDGE_LINKS = [
    [0, 1], [0, 2], [1, 2], [1, 3], [2, 4], [3, 5], [4, 6], [5, 6], [5, 7], [5, 11],
    [6, 8], [6, 12], [7, 9], [8, 10], [11, 12], [11, 13], [12, 14], [13, 15], [14, 16],
]
COCO_POSE_DEFAULT_EDGE_COLORS = [
    (214, 39, 40), (148, 103, 189), (44, 160, 44), (140, 86, 75), (227, 119, 194),
    (127, 127, 127), (188, 189, 34), (127, 127, 127), (188, 189, 34), (140, 86, 75),
    (23, 190, 207), (227, 119, 194), (31, 119, 180), (255, 127, 14), (148, 103, 189),
    (255, 127, 14), (214, 39, 40), (31, 119, 180), (44, 160, 44),
]
COCO_POSE_DEFAULT_KEYPOINT_COLORS = [(148, 103, 189), (31, 119, 180)] * 8 + [(148, 103, 189)]


def _coco_class_names():
    from super_gradients_tpu.models.class_names import COCO_DETECTION_CLASSES_LIST

    return COCO_DETECTION_CLASSES_LIST


def _cityscapes_class_names():
    from super_gradients_tpu.models.class_names import CITYSCAPES_CLASSES_LIST

    return CITYSCAPES_CLASSES_LIST


def default_yolox_coco_processing_params() -> Dict[str, Any]:
    """ref processing.py:914 (BGR + longest-max-size 640 + BR pad 114, raw 0-255)."""
    return dict(
        class_names=_coco_class_names(),
        image_processor=ComposeProcessing(
            [
                ReverseImageChannels(),
                DetectionLongestMaxSizeRescale((640, 640)),
                DetectionBottomRightPadding((640, 640), 114),
            ]
        ),
        iou=0.65,
        conf=0.1,
    )


def default_ppyoloe_coco_processing_params() -> Dict[str, Any]:
    """ref processing.py:937 (BGR + direct rescale 640 + channel normalize)."""
    return dict(
        class_names=_coco_class_names(),
        image_processor=ComposeProcessing(
            [
                ReverseImageChannels(),
                DetectionRescale((640, 640)),
                NormalizeImage(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
            ]
        ),
        iou=0.65,
        conf=0.5,
    )


def default_yolo_nas_coco_processing_params() -> Dict[str, Any]:
    """ref processing.py:960."""
    return dict(
        class_names=_coco_class_names(),
        image_processor=default_yolo_nas_coco_processing(640),
        iou=0.7,
        conf=0.25,
    )


def default_dekr_coco_processing_params() -> Dict[str, Any]:
    """ref processing.py:983."""
    return dict(
        image_processor=ComposeProcessing(
            [
                ReverseImageChannels(),
                KeypointsLongestMaxSizeRescale((640, 640)),
                KeypointsBottomRightPadding((640, 640), 127),
                StandardizeImage(255.0),
                NormalizeImage(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
            ]
        ),
        conf=0.05,
        edge_links=COCO_POSE_DEFAULT_EDGE_LINKS,
        edge_colors=COCO_POSE_DEFAULT_EDGE_COLORS,
        keypoint_colors=COCO_POSE_DEFAULT_KEYPOINT_COLORS,
    )


def default_yolo_nas_pose_coco_processing_params() -> Dict[str, Any]:
    """ref processing.py:1064."""
    return dict(
        image_processor=ComposeProcessing(
            [
                ReverseImageChannels(),
                KeypointsLongestMaxSizeRescale((640, 640)),
                KeypointsBottomRightPadding((640, 640), 127),
                StandardizeImage(255.0),
            ]
        ),
        conf=0.5,
        edge_links=COCO_POSE_DEFAULT_EDGE_LINKS,
        edge_colors=COCO_POSE_DEFAULT_EDGE_COLORS,
        keypoint_colors=COCO_POSE_DEFAULT_KEYPOINT_COLORS,
    )


def default_imagenet_processing_params() -> Dict[str, Any]:
    """ref processing.py:1142."""
    return dict(
        image_processor=ComposeProcessing(
            [
                Resize(256),
                CenterCrop(224),
                StandardizeImage(255.0),
                NormalizeImage(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
            ]
        ),
    )


def default_vit_imagenet_processing_params() -> Dict[str, Any]:
    """ref processing.py:1154 (0.5/0.5 normalize)."""
    return dict(
        image_processor=ComposeProcessing(
            [
                Resize(256),
                CenterCrop(224),
                StandardizeImage(255.0),
                NormalizeImage(mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5]),
            ]
        ),
    )


def default_cityscapes_processing_params(scale: float = 1.0) -> Dict[str, Any]:
    """ref processing.py:1166 (resize-with-padding to scale*(1024,2048))."""
    return dict(
        class_names=_cityscapes_class_names(),
        image_processor=ComposeProcessing(
            [
                SegmentationResizeWithPadding((int(1024 * scale), int(2048 * scale)), pad_value=0),
                NormalizeImage(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
                StandardizeImage(255.0),
            ]
        ),
    )


def default_segformer_cityscapes_processing_params() -> Dict[str, Any]:
    """ref processing.py:1183 (long-size rescale 1024 + pad-short-to-crop (1024,2048))."""
    return dict(
        class_names=_cityscapes_class_names(),
        image_processor=ComposeProcessing(
            [
                SegmentationRescale(long_size=1024),
                SegmentationPadShortToCropSize((1024, 2048), fill_image=0),
                NormalizeImage(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
                StandardizeImage(255.0),
            ]
        ),
    )


def get_pretrained_processing_params(model_name: str, pretrained_weights: str) -> Dict[str, Any]:
    """Processing params the published checkpoint was evaluated with
    (ref processing.py:1201 get_pretrained_processing_params)."""
    if pretrained_weights == "coco":
        if "yolox" in model_name:
            return default_yolox_coco_processing_params()
        if "ppyoloe" in model_name or "pp_yoloe" in model_name:
            return default_ppyoloe_coco_processing_params()
        if "yolo_nas" in model_name:
            return default_yolo_nas_coco_processing_params()

    if pretrained_weights == "coco_pose":
        if model_name.startswith("dekr"):
            return default_dekr_coco_processing_params()
        if model_name.startswith("yolo_nas_pose"):
            return default_yolo_nas_pose_coco_processing_params()

    if pretrained_weights == "imagenet" and model_name in {"vit_base", "vit_large", "vit_huge"}:
        return default_vit_imagenet_processing_params()
    if pretrained_weights == "imagenet":
        return default_imagenet_processing_params()

    if pretrained_weights == "cityscapes":
        if model_name in {"pp_lite_t_seg75", "pp_lite_b_seg75", "stdc1_seg75", "stdc2_seg75"}:
            return default_cityscapes_processing_params(0.75)
        if model_name in {"pp_lite_t_seg50", "pp_lite_b_seg50", "stdc1_seg50", "stdc2_seg50"}:
            return default_cityscapes_processing_params(0.50)
        if model_name in {"ddrnet_23", "ddrnet_23_slim", "ddrnet_39"}:
            return default_cityscapes_processing_params(1.0)
        if model_name.startswith("segformer_b"):
            return default_segformer_cityscapes_processing_params()
    return {}
