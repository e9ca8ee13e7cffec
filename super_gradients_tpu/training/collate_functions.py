"""Detection collate functions.

Reference parity: ``training/utils/collate_fn/`` — DetectionCollateFN
(detection_collate_fn.py), PPYoloECollateFN multi-scale batch resize
(ppyoloe_collate_fn.py:16-121), CrowdDetectionPPYoloECollateFN
(crowd_detection_ppyoloe_collate_fn.py).

TPU-native notes: multi-scale training changes the batch's spatial shape, which on
XLA means one compiled program per size. That is fine — and standard — as long as the
size set is SMALL and FIXED: each (H, W) compiles once and is cached for the rest of
training. Keep ``random_resize_sizes`` to a handful of values (e.g. 10 multiples of
32); avoid `random_aspect_ratio=True` with a large size list, which multiplies the
compile-cache footprint.

Targets here are the library's padded ``[max_boxes, 5]`` rows ``(label, x1, y1, x2,
y2)`` in absolute pixels with -1 padding; only valid rows are rescaled.
"""

from __future__ import annotations

import itertools
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from super_gradients_tpu.common.registry import create_register_decorator

COLLATE_FUNCTIONS: dict = {}
register_collate_function = create_register_decorator(COLLATE_FUNCTIONS)


def _resize_image(image: np.ndarray, hw: Tuple[int, int], mode: int) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(image, dsize=(int(hw[1]), int(hw[0])), interpolation=int(mode))
    except ImportError:
        from PIL import Image

        pil_modes = {0: Image.NEAREST, 1: Image.BILINEAR, 2: Image.BICUBIC, 3: Image.BOX, 4: Image.LANCZOS}
        arr = image
        scaled = np.asarray(
            Image.fromarray((arr * 255).astype(np.uint8) if arr.dtype != np.uint8 else arr).resize(
                (int(hw[1]), int(hw[0])), pil_modes.get(int(mode), Image.BILINEAR)
            )
        )
        return scaled.astype(image.dtype) / (255.0 if image.dtype != np.uint8 else 1)


@register_collate_function("DetectionCollateFN")
class DetectionCollateFN:
    """Stack (image, padded-target) pairs (ref detection_collate_fn.py)."""

    expected_item_names = ("image", "targets")

    def __call__(self, samples: Sequence[Tuple]) -> Tuple[np.ndarray, np.ndarray]:
        images = np.stack([np.asarray(s[0]) for s in samples])
        targets = np.stack([np.asarray(s[1]) for s in samples])
        return images, targets


@register_collate_function("PPYoloECollateFN")
class PPYoloECollateFN(DetectionCollateFN):
    """Multi-scale batch collate (ref ppyoloe_collate_fn.py:16-121): one target size
    sampled per batch from a fixed set; images resized, valid boxes rescaled."""

    def __init__(
        self,
        random_resize_sizes: Optional[List[int]] = None,
        random_resize_modes: Optional[List[int]] = None,
        random_aspect_ratio: Union[bool, Tuple[float, float]] = False,
        seed: int = 0,
    ):
        if random_resize_sizes is not None:
            sizes = np.array(list(itertools.product(random_resize_sizes, random_resize_sizes)))  # [N, 2] (h, w)
            if random_aspect_ratio is False:
                sizes = sizes[sizes[:, 0] == sizes[:, 1]]
            elif random_aspect_ratio is True:
                pass
            elif isinstance(random_aspect_ratio, (tuple, list)):
                lo, hi = random_aspect_ratio
                if lo > hi:
                    raise ValueError(f"min_aspect_ratio {lo} must be <= max_aspect_ratio {hi}")
                ar = sizes[:, 0] / sizes[:, 1]
                sizes = sizes[(ar >= lo) & (ar <= hi)]
                if len(sizes) == 0:
                    raise ValueError(f"random_aspect_ratio={random_aspect_ratio} leaves no valid size combinations")
            else:
                raise ValueError(f"Unsupported random_aspect_ratio value: {random_aspect_ratio}")
            self.random_resize_sizes = sizes
        else:
            self.random_resize_sizes = None
        self.random_resize_modes = list(random_resize_modes) if random_resize_modes is not None else [1]
        self._rng = np.random.RandomState(seed)

    def __repr__(self):
        return f"PPYoloECollateFN(random_resize_sizes={self.random_resize_sizes}, random_resize_modes={self.random_resize_modes})"

    def __call__(self, samples: Sequence[Tuple]):
        if self.random_resize_sizes is not None:
            samples = self.random_resize(samples)
        return super().__call__(samples)

    def random_resize(self, samples):
        hw = self.random_resize_sizes[self._rng.randint(len(self.random_resize_sizes))]
        mode = self.random_resize_modes[self._rng.randint(len(self.random_resize_modes))]
        return [self.random_resize_sample(s, (int(hw[0]), int(hw[1])), mode) for s in samples]

    @staticmethod
    def random_resize_sample(sample, target_hw: Tuple[int, int], interpolation: int):
        image, targets = sample[0], np.asarray(sample[1]).copy()
        th, tw = target_hw
        sy, sx = th / image.shape[0], tw / image.shape[1]
        image = _resize_image(np.asarray(image), (th, tw), interpolation)
        valid = targets[:, 0] >= 0
        targets[valid, 1:5] = targets[valid, 1:5] * np.array([sx, sy, sx, sy], dtype=targets.dtype)
        if len(sample) == 3:  # crowd variant
            crowd = np.asarray(sample[2]).copy()
            cvalid = crowd[:, 0] >= 0
            crowd[cvalid, 1:5] = crowd[cvalid, 1:5] * np.array([sx, sy, sx, sy], dtype=crowd.dtype)
            return image, targets, crowd
        return image, targets


@register_collate_function("CrowdDetectionCollateFN")
class CrowdDetectionCollateFN(DetectionCollateFN):
    """Stack (image, targets, crowd_targets) triples (ref crowd_detection_collate_fn.py)."""

    expected_item_names = ("image", "targets", "crowd_targets")

    def __call__(self, samples):
        images = np.stack([np.asarray(s[0]) for s in samples])
        targets = np.stack([np.asarray(s[1]) for s in samples])
        crowd = np.stack([np.asarray(s[2]) for s in samples])
        return images, targets, crowd


@register_collate_function("CrowdDetectionPPYoloECollateFN")
class CrowdDetectionPPYoloECollateFN(PPYoloECollateFN):
    """Multi-scale + crowd targets (ref crowd_detection_ppyoloe_collate_fn.py)."""

    expected_item_names = ("image", "targets", "crowd_targets")

    def __call__(self, samples):
        if self.random_resize_sizes is not None:
            samples = self.random_resize(samples)
        images = np.stack([np.asarray(s[0]) for s in samples])
        targets = np.stack([np.asarray(s[1]) for s in samples])
        crowd = np.stack([np.asarray(s[2]) for s in samples])
        return images, targets, crowd
