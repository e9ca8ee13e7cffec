"""Keypoint (pose) transforms.

Reference: ``training/transforms/keypoints/`` (18 files: flips with joint-pair
remap, longest-max-size, pad, HSV, brightness/contrast...). Host-side numpy ops on
:class:`PoseSample` (image + per-person boxes/joints).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.registry import register_transform

#: COCO left/right joint swap order (flip_index)
COCO_FLIP_INDEX = [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]


@dataclasses.dataclass
class PoseSample:
    image: np.ndarray  # HWC
    boxes_xyxy: np.ndarray  # [N, 4]
    joints: np.ndarray  # [N, K, 3] (x, y, visibility)

    def to_padded_targets(self, max_poses: int) -> np.ndarray:
        n, k = self.joints.shape[:2]
        out = np.full((max_poses, 5 + 3 * k), -1.0, np.float32)
        m = min(n, max_poses)
        if m:
            out[:m, 0] = 0.0
            out[:m, 1:5] = self.boxes_xyxy[:m]
            out[:m, 5:] = self.joints[:m].reshape(m, -1)
        return out


class KeypointTransform:
    def __call__(self, sample: PoseSample) -> PoseSample:
        raise NotImplementedError


@register_transform("KeypointsHorizontalFlip")
class KeypointsHorizontalFlip(KeypointTransform):
    """HFlip with left/right joint remap (ref keypoints/keypoints_hflip.py)."""

    def __init__(self, flip_index: Sequence[int] = tuple(COCO_FLIP_INDEX), prob: float = 0.5):
        self.flip_index = list(flip_index)
        self.prob = prob

    def __call__(self, sample):
        if random.random() >= self.prob:
            return sample
        h, w = sample.image.shape[:2]
        img = sample.image[:, ::-1].copy()
        boxes = sample.boxes_xyxy.copy()
        boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        joints = sample.joints[:, self.flip_index].copy()
        joints[..., 0] = w - joints[..., 0]
        return PoseSample(img, boxes, joints)


@register_transform("KeypointsLongestMaxSize")
class KeypointsLongestMaxSize(KeypointTransform):
    def __init__(self, max_height: int = 640, max_width: int = 640):
        self.max_hw = (max_height, max_width)

    def __call__(self, sample):
        from PIL import Image

        h, w = sample.image.shape[:2]
        scale = min(self.max_hw[0] / h, self.max_hw[1] / w)
        nh, nw = round(h * scale), round(w * scale)
        img = np.asarray(Image.fromarray(sample.image.astype(np.uint8)).resize((nw, nh), Image.BILINEAR))
        joints = sample.joints.copy()
        joints[..., :2] *= scale
        return PoseSample(img, sample.boxes_xyxy * scale, joints)


@register_transform("KeypointsPadIfNeeded")
class KeypointsPadIfNeeded(KeypointTransform):
    def __init__(self, min_height: int = 640, min_width: int = 640, image_pad_value: int = 114):
        self.min_hw = (min_height, min_width)
        self.pad_value = image_pad_value

    def __call__(self, sample):
        h, w = sample.image.shape[:2]
        th, tw = max(h, self.min_hw[0]), max(w, self.min_hw[1])
        canvas = np.full((th, tw) + sample.image.shape[2:], self.pad_value, sample.image.dtype)
        canvas[:h, :w] = sample.image
        return PoseSample(canvas, sample.boxes_xyxy, sample.joints)


@register_transform("KeypointsStandardize")
class KeypointsStandardize(KeypointTransform):
    def __init__(self, max_value: float = 255.0):
        self.max_value = max_value

    def __call__(self, sample):
        return PoseSample(sample.image.astype(np.float32) / self.max_value, sample.boxes_xyxy, sample.joints)


@register_transform("KeypointsRemoveSmallObjects")
class KeypointsRemoveSmallObjects(KeypointTransform):
    def __init__(self, min_visible_joints: int = 1, min_area: float = 64.0):
        self.min_visible_joints = min_visible_joints
        self.min_area = min_area

    def __call__(self, sample):
        vis = (sample.joints[..., 2] > 0).sum(-1)
        area = np.clip(sample.boxes_xyxy[:, 2] - sample.boxes_xyxy[:, 0], 0, None) * np.clip(
            sample.boxes_xyxy[:, 3] - sample.boxes_xyxy[:, 1], 0, None
        )
        keep = (vis >= self.min_visible_joints) & (area >= self.min_area)
        return PoseSample(sample.image, sample.boxes_xyxy[keep], sample.joints[keep])


class ComposeKeypointTransforms:
    def __init__(self, transforms: Sequence[KeypointTransform]):
        self.transforms = list(transforms)

    def __call__(self, sample: PoseSample) -> PoseSample:
        for t in self.transforms:
            sample = t(sample)
        return sample
