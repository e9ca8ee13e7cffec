"""Segmentation augmentations (host-side numpy/PIL, applied pre-batching).

Reference: ``training/transforms/transforms.py`` Seg* classes (SegResize:64,
SegRandomFlip:81, SegRescale:104, SegRandomRescale:155, SegRandomRotate:202,
SegCropImageAndMask:234, SegRandomGaussianBlur:286, SegPadShortToCropSize:308,
SegPadToDivisible:359, SegColorJitter:394, SegStandardize:854, SegNormalize:875).

Protocol: each transform is ``__call__(sample: SegSample) -> SegSample`` where
``SegSample.image`` is float32 [H, W, 3] (0..255 until SegStandardize) and
``SegSample.mask`` is int32 [H, W] with ``ignore_index`` (255) for void pixels.
Images use bilinear interpolation; masks always NEAREST so class ids stay exact.
The final batch goes to the device as static-shape arrays — crop/pad transforms
are how variable-size datasets reach a fixed training resolution.
"""

from __future__ import annotations

import dataclasses
import random
from typing import Optional, Sequence, Tuple, Union

import numpy as np

from super_gradients_tpu.common.registry import register_transform


@dataclasses.dataclass
class SegSample:
    image: np.ndarray  # [H, W, 3] float32
    mask: np.ndarray  # [H, W] int32


def _pil_pair(sample: SegSample):
    from PIL import Image

    img = Image.fromarray(np.clip(sample.image, 0, 255).astype(np.uint8))
    msk = Image.fromarray(sample.mask.astype(np.uint8), mode="L")
    return img, msk


def _from_pil(img, msk) -> SegSample:
    return SegSample(np.asarray(img, np.float32), np.asarray(msk, np.int32))


@register_transform("SegResize")
class SegResize:
    """Resize to (h, w); bilinear image / nearest mask (ref transforms.py:64)."""

    def __init__(self, h: int = 512, w: int = 512):
        self.h, self.w = h, w

    def __call__(self, sample: SegSample) -> SegSample:
        from PIL import Image

        img, msk = _pil_pair(sample)
        return _from_pil(
            img.resize((self.w, self.h), Image.BILINEAR), msk.resize((self.w, self.h), Image.NEAREST)
        )


@register_transform("SegRandomFlip")
class SegRandomFlip:
    """Horizontal flip of image+mask with probability p (ref transforms.py:81)."""

    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def __call__(self, sample: SegSample) -> SegSample:
        if random.random() < self.prob:
            return SegSample(np.ascontiguousarray(sample.image[:, ::-1]), np.ascontiguousarray(sample.mask[:, ::-1]))
        return sample


def _rescale(sample: SegSample, scale: float) -> SegSample:
    from PIL import Image

    img, msk = _pil_pair(sample)
    w, h = img.size
    nw, nh = max(1, int(round(w * scale))), max(1, int(round(h * scale)))
    return _from_pil(img.resize((nw, nh), Image.BILINEAR), msk.resize((nw, nh), Image.NEAREST))


@register_transform("SegRescale")
class SegRescale:
    """Deterministic rescale by ``scale_factor``, or to fit ``short_size``/``long_size``
    (ref transforms.py:104-150)."""

    def __init__(self, scale_factor: Optional[float] = None, short_size: Optional[int] = None,
                 long_size: Optional[int] = None):
        self.scale_factor, self.short_size, self.long_size = scale_factor, short_size, long_size

    def __call__(self, sample: SegSample) -> SegSample:
        h, w = sample.mask.shape
        if self.scale_factor is not None:
            scale = self.scale_factor
        elif self.short_size is not None:
            scale = self.short_size / min(h, w)
        elif self.long_size is not None:
            scale = self.long_size / max(h, w)
        else:
            return sample
        return _rescale(sample, scale)


@register_transform("SegRandomRescale")
class SegRandomRescale:
    """Random scale in ``scales=(lo, hi)`` (ref transforms.py:155-198)."""

    def __init__(self, scales: Union[float, Tuple[float, float]] = (0.5, 2.0)):
        if isinstance(scales, (int, float)):
            scales = (1.0 / scales, scales) if scales > 1 else (scales, 1.0 / scales)
        if scales[0] > scales[1]:
            scales = (scales[1], scales[0])
        if scales[0] <= 0:
            raise ValueError(f"SegRandomRescale scales must be positive, got {scales}")
        self.scales = tuple(scales)

    def __call__(self, sample: SegSample) -> SegSample:
        return _rescale(sample, random.uniform(*self.scales))


@register_transform("SegRandomRotate")
class SegRandomRotate:
    """Random rotation in ±``max_angle`` degrees; exposed pixels filled with
    ``image_pad_color`` / ``mask_fill_color`` (=ignore) (ref transforms.py:202-230)."""

    def __init__(self, min_deg: float = -10.0, max_deg: float = 10.0,
                 fill_mask: int = 255, fill_image: Union[int, Tuple[int, int, int]] = 0):
        self.min_deg, self.max_deg = min_deg, max_deg
        self.fill_mask = fill_mask
        self.fill_image = tuple(fill_image) if isinstance(fill_image, (tuple, list)) else (fill_image,) * 3

    def __call__(self, sample: SegSample) -> SegSample:
        from PIL import Image

        deg = random.uniform(self.min_deg, self.max_deg)
        img, msk = _pil_pair(sample)
        img = img.rotate(deg, resample=Image.BILINEAR, fillcolor=self.fill_image)
        msk = msk.rotate(deg, resample=Image.NEAREST, fillcolor=self.fill_mask)
        return _from_pil(img, msk)


@register_transform("SegCropImageAndMask")
class SegCropImageAndMask:
    """Crop to ``crop_size`` — mode "random" or "center" (ref transforms.py:234-282)."""

    def __init__(self, crop_size: Union[int, Tuple[int, int]] = 512, mode: str = "random"):
        if isinstance(crop_size, int):
            crop_size = (crop_size, crop_size)
        if mode not in ("random", "center"):
            raise ValueError(f"SegCropImageAndMask mode must be random|center, got {mode}")
        self.crop_h, self.crop_w = crop_size
        self.mode = mode

    def __call__(self, sample: SegSample) -> SegSample:
        h, w = sample.mask.shape
        ch, cw = min(self.crop_h, h), min(self.crop_w, w)
        if self.mode == "random":
            y0 = random.randint(0, h - ch)
            x0 = random.randint(0, w - cw)
        else:
            y0, x0 = (h - ch) // 2, (w - cw) // 2
        return SegSample(sample.image[y0:y0 + ch, x0:x0 + cw], sample.mask[y0:y0 + ch, x0:x0 + cw])


@register_transform("SegRandomGaussianBlur")
class SegRandomGaussianBlur:
    """Gaussian blur of the image only, with probability p (ref transforms.py:286-303)."""

    def __init__(self, prob: float = 0.5, kernel_size: int = 3, sigma: Tuple[float, float] = (0.1, 2.0)):
        self.prob = prob
        self.sigma = sigma

    def __call__(self, sample: SegSample) -> SegSample:
        if random.random() >= self.prob:
            return sample
        from PIL import Image, ImageFilter

        img = Image.fromarray(np.clip(sample.image, 0, 255).astype(np.uint8))
        img = img.filter(ImageFilter.GaussianBlur(radius=random.uniform(*self.sigma)))
        return SegSample(np.asarray(img, np.float32), sample.mask)


@register_transform("SegPadShortToCropSize")
class SegPadShortToCropSize:
    """Pad short edges up to ``crop_size`` (center pad); mask pads with
    ``fill_mask`` = ignore_index (ref transforms.py:308-355)."""

    def __init__(self, crop_size: Union[int, Tuple[int, int]] = 512,
                 fill_mask: int = 255, fill_image: Union[int, Tuple[int, int, int]] = 0):
        if isinstance(crop_size, int):
            crop_size = (crop_size, crop_size)
        self.crop_h, self.crop_w = crop_size
        self.fill_mask = fill_mask
        self.fill_image = fill_image if isinstance(fill_image, (int, float)) else tuple(fill_image)

    def _pad(self, sample: SegSample, pad_h: int, pad_w: int) -> SegSample:
        t, l = pad_h // 2, pad_w // 2
        b, r = pad_h - t, pad_w - l
        img = np.pad(sample.image, ((t, b), (l, r), (0, 0)), constant_values=0.0)
        if not isinstance(self.fill_image, (int, float)):
            for ci, v in enumerate(self.fill_image):
                if t:
                    img[:t, :, ci] = v
                if b:
                    img[img.shape[0] - b:, :, ci] = v
                if l:
                    img[:, :l, ci] = v
                if r:
                    img[:, img.shape[1] - r:, ci] = v
        elif self.fill_image:
            img = np.pad(sample.image, ((t, b), (l, r), (0, 0)), constant_values=float(self.fill_image))
        msk = np.pad(sample.mask, ((t, b), (l, r)), constant_values=self.fill_mask)
        return SegSample(img, msk)

    def __call__(self, sample: SegSample) -> SegSample:
        h, w = sample.mask.shape
        pad_h, pad_w = max(0, self.crop_h - h), max(0, self.crop_w - w)
        if pad_h == 0 and pad_w == 0:
            return sample
        return self._pad(sample, pad_h, pad_w)


@register_transform("SegPadToDivisible")
class SegPadToDivisible(SegPadShortToCropSize):
    """Pad bottom/right so H and W divide ``divisible_value`` (ref transforms.py:359-390)."""

    def __init__(self, divisible_value: int = 32, fill_mask: int = 255,
                 fill_image: Union[int, Tuple[int, int, int]] = 0):
        super().__init__(crop_size=1, fill_mask=fill_mask, fill_image=fill_image)
        self.div = divisible_value

    def __call__(self, sample: SegSample) -> SegSample:
        h, w = sample.mask.shape
        pad_h = (self.div - h % self.div) % self.div
        pad_w = (self.div - w % self.div) % self.div
        if pad_h == 0 and pad_w == 0:
            return sample
        # bottom/right pad only
        img = np.pad(sample.image, ((0, pad_h), (0, pad_w), (0, 0)), constant_values=0.0)
        msk = np.pad(sample.mask, ((0, pad_h), (0, pad_w)), constant_values=self.fill_mask)
        return SegSample(img, msk)


@register_transform("SegColorJitter")
class SegColorJitter:
    """Brightness/contrast/saturation/hue jitter of the image (ref transforms.py:394-430).

    Each factor is sampled uniformly from ``max(0, 1-v) .. 1+v`` (hue from ``-v..v``).
    """

    def __init__(self, brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, hue: float = 0.0):
        self.brightness, self.contrast, self.saturation, self.hue = brightness, contrast, saturation, hue

    def __call__(self, sample: SegSample) -> SegSample:
        from PIL import Image, ImageEnhance

        img = Image.fromarray(np.clip(sample.image, 0, 255).astype(np.uint8))
        ops = []
        if self.brightness:
            ops.append(lambda im: ImageEnhance.Brightness(im).enhance(
                random.uniform(max(0, 1 - self.brightness), 1 + self.brightness)))
        if self.contrast:
            ops.append(lambda im: ImageEnhance.Contrast(im).enhance(
                random.uniform(max(0, 1 - self.contrast), 1 + self.contrast)))
        if self.saturation:
            ops.append(lambda im: ImageEnhance.Color(im).enhance(
                random.uniform(max(0, 1 - self.saturation), 1 + self.saturation)))
        if self.hue:
            def _hue(im):
                h, s, v = im.convert("HSV").split()
                shift = int(random.uniform(-self.hue, self.hue) * 255)
                h = h.point(lambda p: (p + shift) % 256)
                return Image.merge("HSV", (h, s, v)).convert("RGB")

            ops.append(_hue)
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return SegSample(np.asarray(img, np.float32), sample.mask)


@register_transform("SegStandardize")
class SegStandardize:
    """uint8-range → [0, 1] (ref transforms.py:854-870)."""

    def __init__(self, max_value: float = 255.0):
        self.max_value = max_value

    def __call__(self, sample: SegSample) -> SegSample:
        return SegSample(sample.image / self.max_value, sample.mask)


@register_transform("SegNormalize")
class SegNormalize:
    """Channel-wise (x - mean) / std (ref transforms.py:875-893)."""

    def __init__(self, mean: Sequence[float] = (0.485, 0.456, 0.406),
                 std: Sequence[float] = (0.229, 0.224, 0.225)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample: SegSample) -> SegSample:
        return SegSample((sample.image - self.mean) / self.std, sample.mask)


class SegCompose:
    """Chain of segmentation transforms; also accepts/returns an (image, mask) tuple."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample_or_image, mask: Optional[np.ndarray] = None):
        tuple_in = not isinstance(sample_or_image, SegSample)
        sample = SegSample(np.asarray(sample_or_image, np.float32), np.asarray(mask, np.int32)) if tuple_in else sample_or_image
        for t in self.transforms:
            sample = t(sample)
        return (sample.image, sample.mask) if tuple_in else sample
