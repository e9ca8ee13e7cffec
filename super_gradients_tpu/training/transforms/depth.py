"""Depth-estimation sample + transforms.

Reference: ``training/samples/depth_estimation_sample.py`` (sample schema) and
``transforms/depth_estimation/abstract_depth_estimation_transform.py`` (the
reference ships only the abstract base; concrete flips/resize/crop here reuse the
segmentation machinery since a depth map transforms like a float-valued mask —
bilinear for depth values, with an ``invalid_value`` fill for exposed pixels).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Tuple, Union

import numpy as np

from super_gradients_tpu.common.registry import register_transform


@dataclasses.dataclass
class DepthEstimationSample:
    """image [H, W, C] float32 + depth_map [H, W] float32 (ref sample:10-35)."""

    image: np.ndarray
    depth_map: np.ndarray

    def __post_init__(self):
        if self.depth_map.ndim == 3:
            if self.depth_map.shape[-1] != 1:
                raise RuntimeError(
                    f"depth map must be [H, W] (or [H, W, 1]), got shape {self.depth_map.shape}"
                )
            self.depth_map = self.depth_map[..., 0]


@register_transform("DepthHorizontalFlip")
class DepthHorizontalFlip:
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def __call__(self, sample: DepthEstimationSample) -> DepthEstimationSample:
        if random.random() < self.prob:
            return DepthEstimationSample(
                np.ascontiguousarray(sample.image[:, ::-1]),
                np.ascontiguousarray(sample.depth_map[:, ::-1]),
            )
        return sample


@register_transform("DepthResize")
class DepthResize:
    """Bilinear resize of image AND depth values to (h, w)."""

    def __init__(self, h: int = 384, w: int = 384):
        self.h, self.w = h, w

    def __call__(self, sample: DepthEstimationSample) -> DepthEstimationSample:
        from PIL import Image

        img = Image.fromarray(np.clip(sample.image, 0, 255).astype(np.uint8)).resize(
            (self.w, self.h), Image.BILINEAR
        )
        dm = Image.fromarray(sample.depth_map.astype(np.float32), mode="F").resize(
            (self.w, self.h), Image.BILINEAR
        )
        return DepthEstimationSample(np.asarray(img, np.float32), np.asarray(dm, np.float32))


@register_transform("DepthRandomCrop")
class DepthRandomCrop:
    def __init__(self, crop_size: Union[int, Tuple[int, int]] = 384):
        if isinstance(crop_size, int):
            crop_size = (crop_size, crop_size)
        self.crop_h, self.crop_w = crop_size

    def __call__(self, sample: DepthEstimationSample) -> DepthEstimationSample:
        h, w = sample.depth_map.shape
        ch, cw = min(self.crop_h, h), min(self.crop_w, w)
        y0 = random.randint(0, h - ch)
        x0 = random.randint(0, w - cw)
        return DepthEstimationSample(
            sample.image[y0:y0 + ch, x0:x0 + cw], sample.depth_map[y0:y0 + ch, x0:x0 + cw]
        )
