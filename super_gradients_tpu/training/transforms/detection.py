"""Detection transforms — host-side numpy augmentation pipeline.

Reference: ``training/transforms/transforms.py`` — DetectionMosaic (:514),
DetectionRandomAffine (:603), DetectionMixup (:693), DetectionPaddedRescale (:945),
DetectionHSV (:1181), HFlip/VFlip (:980/:1012), DetectionStandardize (:490) — and the
sample dataclass design (``training/samples/*``: normalized in-memory schema).

TPU notes (SURVEY §7 "Mosaic/mixup on host"): augmentation stays on the host CPU —
cv2 on the hot paths (resize / warpAffine / cvtColor-LUT HSV, exactly like the
reference's transforms.py:603/:1181), numpy+PIL as the no-cv2 fallback; the device
receives fixed-size images + padded ``[max_boxes, 5]`` targets. Transforms that need
extra images
(mosaic/mixup) declare ``additional_samples_count`` and receive them from the
dataset, mirroring the reference's ``additional_samples`` feed
(``detection_dataset.py:394-433``).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

try:  # cv2 is the hot-path kernel (reference uses it for ALL image warps); PIL/numpy
    import cv2  # noqa: F401  # fallbacks below keep the module importable without it
except ImportError:  # pragma: no cover
    cv2 = None

from super_gradients_tpu.common.registry import register_transform


@dataclasses.dataclass
class DetectionSample:
    """Normalized in-memory sample (ref ``training/samples/detection_sample.py``)."""

    image: np.ndarray  # HWC uint8/float
    bboxes_xyxy: np.ndarray  # [N, 4] float32
    labels: np.ndarray  # [N] int32
    is_crowd: Optional[np.ndarray] = None

    def filter_valid(self, min_size: float = 1.0) -> "DetectionSample":
        w = self.bboxes_xyxy[:, 2] - self.bboxes_xyxy[:, 0]
        h = self.bboxes_xyxy[:, 3] - self.bboxes_xyxy[:, 1]
        keep = (w >= min_size) & (h >= min_size)
        return DetectionSample(
            self.image,
            self.bboxes_xyxy[keep],
            self.labels[keep],
            self.is_crowd[keep] if self.is_crowd is not None else None,
        )


class DetectionTransform:
    additional_samples_count: int = 0

    def __call__(self, sample: DetectionSample, additional: Sequence[DetectionSample] = ()) -> DetectionSample:
        raise NotImplementedError


def _resize(image: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    # cv2 INTER_LINEAR matches the reference's train-time rescale kernel
    # (ref transforms/utils.py:25) and is ~5x faster than PIL on the hot
    # mosaic path; PIL stays as the no-cv2 fallback
    if cv2 is not None:
        return cv2.resize(image.astype(np.uint8), dsize=(out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
    from PIL import Image

    return np.asarray(Image.fromarray(image.astype(np.uint8)).resize((out_hw[1], out_hw[0]), Image.BILINEAR))


@register_transform("DetectionStandardize")
class DetectionStandardize(DetectionTransform):
    """image / max_value (ref :490)."""

    def __init__(self, max_value: float = 255.0):
        self.max_value = max_value

    def __call__(self, sample, additional=()):
        # single-pass uint8->f32 scale (np.multiply with dtype= fuses the cast
        # and divide; measured 2x over astype-then-divide on the 640px hot path)
        img = np.multiply(sample.image, np.float32(1.0 / self.max_value), dtype=np.float32)
        return DetectionSample(img, sample.bboxes_xyxy, sample.labels, sample.is_crowd)


@register_transform("DetectionHorizontalFlip")
class DetectionHorizontalFlip(DetectionTransform):
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def __call__(self, sample, additional=()):
        if random.random() >= self.prob:
            return sample
        h, w = sample.image.shape[:2]
        img = sample.image[:, ::-1].copy()
        boxes = sample.bboxes_xyxy.copy()
        boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        return DetectionSample(img, boxes, sample.labels, sample.is_crowd)


@register_transform("DetectionVerticalFlip")
class DetectionVerticalFlip(DetectionTransform):
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def __call__(self, sample, additional=()):
        if random.random() >= self.prob:
            return sample
        h, w = sample.image.shape[:2]
        img = sample.image[::-1].copy()
        boxes = sample.bboxes_xyxy.copy()
        boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
        return DetectionSample(img, boxes, sample.labels, sample.is_crowd)


@register_transform("DetectionHSV")
class DetectionHSV(DetectionTransform):
    """Random hue/sat/value gains (ref :1181 — cv2 cvtColor + per-channel LUT, the
    reference's exact hot-path formulation; vectorized-numpy fallback without cv2)."""

    def __init__(self, prob: float = 1.0, hgain: float = 5, sgain: float = 30, vgain: float = 30):
        self.prob, self.hgain, self.sgain, self.vgain = prob, hgain, sgain, vgain

    def __call__(self, sample, additional=()):
        if random.random() >= self.prob:
            return sample
        dh = random.uniform(-self.hgain, self.hgain)
        ds = random.uniform(-self.sgain, self.sgain)
        dv = random.uniform(-self.vgain, self.vgain)
        if cv2 is not None:
            # cv2 uint8 HSV: H in [0,180), S/V in [0,255] — three 256-entry LUTs
            # replace full-image float math (~30x less work per pixel than the
            # numpy fallback; this was 1 of the 2 hot ops behind the r04
            # 97.7%-loader-wait regression)
            hsv = cv2.cvtColor(sample.image.astype(np.uint8), cv2.COLOR_RGB2HSV)
            idx = np.arange(256, dtype=np.int16)
            lut_h = ((idx + int(round(dh))) % 180).astype(np.uint8)
            lut_s = np.clip(idx + ds, 0, 255).astype(np.uint8)
            lut_v = np.clip(idx + dv, 0, 255).astype(np.uint8)
            hsv[..., 0] = cv2.LUT(hsv[..., 0], lut_h)
            hsv[..., 1] = cv2.LUT(hsv[..., 1], lut_s)
            hsv[..., 2] = cv2.LUT(hsv[..., 2], lut_v)
            out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(sample.image.dtype)
            return DetectionSample(out, sample.bboxes_xyxy, sample.labels, sample.is_crowd)
        img = sample.image.astype(np.float32)
        # convert RGB->HSV (vectorized)
        maxc = img.max(-1)
        minc = img.min(-1)
        v = maxc
        delta = maxc - minc + 1e-9
        s = delta / (maxc + 1e-9)
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        h = np.where(maxc == r, (g - b) / delta % 6, np.where(maxc == g, (b - r) / delta + 2, (r - g) / delta + 4)) * 30.0

        h = (h + dh) % 180
        s = np.clip(s + ds / 255.0, 0, 1)
        v = np.clip(v + dv, 0, 255)

        # HSV -> RGB
        c = v * s
        hp = h / 30.0
        xx = c * (1 - np.abs(hp % 2 - 1))
        m = v - c
        z = np.zeros_like(c)
        conds = [(hp < 1), (hp < 2), (hp < 3), (hp < 4), (hp < 5), (hp >= 5)]
        rgb = np.zeros_like(img)
        combos = [(c, xx, z), (xx, c, z), (z, c, xx), (z, xx, c), (xx, z, c), (c, z, xx)]
        done = np.zeros_like(c, dtype=bool)
        for cond, (rr, gg, bb) in zip(conds, combos):
            use = cond & ~done
            rgb[..., 0] = np.where(use, rr, rgb[..., 0])
            rgb[..., 1] = np.where(use, gg, rgb[..., 1])
            rgb[..., 2] = np.where(use, bb, rgb[..., 2])
            done |= cond
        out = np.clip(rgb + m[..., None], 0, 255).astype(sample.image.dtype)
        return DetectionSample(out, sample.bboxes_xyxy, sample.labels, sample.is_crowd)


@register_transform("DetectionPaddedRescale")
class DetectionPaddedRescale(DetectionTransform):
    """Letterbox to (input_dim, input_dim) with bottom-right padding (ref :945)."""

    def __init__(self, input_dim: Tuple[int, int] = (640, 640), pad_value: int = 114):
        self.input_dim = tuple(input_dim) if not isinstance(input_dim, int) else (input_dim, input_dim)
        self.pad_value = pad_value

    def __call__(self, sample, additional=()):
        th, tw = self.input_dim
        h, w = sample.image.shape[:2]
        r = min(th / h, tw / w)
        nh, nw = round(h * r), round(w * r)
        resized = _resize(sample.image, (nh, nw))
        canvas = np.full((th, tw, 3), self.pad_value, dtype=resized.dtype)
        canvas[:nh, :nw] = resized
        boxes = sample.bboxes_xyxy * r
        return DetectionSample(canvas, boxes.astype(np.float32), sample.labels, sample.is_crowd)


@register_transform("DetectionMosaic")
class DetectionMosaic(DetectionTransform):
    """4-image mosaic (ref :514)."""

    additional_samples_count = 3

    def __init__(self, input_dim: Tuple[int, int] = (640, 640), prob: float = 1.0):
        self.input_dim = tuple(input_dim) if not isinstance(input_dim, int) else (input_dim, input_dim)
        self.prob = prob

    def __call__(self, sample, additional=()):
        if random.random() >= self.prob or len(additional) < 3:
            return sample
        th, tw = self.input_dim
        yc = int(random.uniform(0.5 * th, 1.5 * th))
        xc = int(random.uniform(0.5 * tw, 1.5 * tw))
        canvas = np.full((th * 2, tw * 2, 3), 114, dtype=np.uint8)
        all_boxes, all_labels = [], []
        samples = [sample] + list(additional[:3])
        for i, s in enumerate(samples):
            h, w = s.image.shape[:2]
            scale = min(th / h, tw / w)
            nh, nw = int(h * scale), int(w * scale)
            img = _resize(s.image, (nh, nw))
            if i == 0:  # top-left
                x1a, y1a = max(xc - nw, 0), max(yc - nh, 0)
                x2a, y2a = xc, yc
                x1b, y1b = nw - (x2a - x1a), nh - (y2a - y1a)
            elif i == 1:  # top-right
                x1a, y1a = xc, max(yc - nh, 0)
                x2a, y2a = min(xc + nw, tw * 2), yc
                x1b, y1b = 0, nh - (y2a - y1a)
            elif i == 2:  # bottom-left
                x1a, y1a = max(xc - nw, 0), yc
                x2a, y2a = xc, min(yc + nh, th * 2)
                x1b, y1b = nw - (x2a - x1a), 0
            else:  # bottom-right
                x1a, y1a = xc, yc
                x2a, y2a = min(xc + nw, tw * 2), min(yc + nh, th * 2)
                x1b, y1b = 0, 0
            x2b, y2b = x1b + (x2a - x1a), y1b + (y2a - y1a)
            canvas[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
            if len(s.bboxes_xyxy):
                b = s.bboxes_xyxy * scale
                b[:, [0, 2]] += x1a - x1b
                b[:, [1, 3]] += y1a - y1b
                all_boxes.append(b)
                all_labels.append(s.labels)
        boxes = np.concatenate(all_boxes) if all_boxes else np.zeros((0, 4), np.float32)
        labels = np.concatenate(all_labels) if all_labels else np.zeros((0,), np.int32)
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, tw * 2)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, th * 2)
        out = DetectionSample(canvas, boxes.astype(np.float32), labels.astype(np.int32)).filter_valid(2.0)
        return out


@register_transform("DetectionRandomAffine")
class DetectionRandomAffine(DetectionTransform):
    """Random rotate/scale/shear/translate (ref :603 — cv2.warpAffine on the forward
    matrix, as the reference does; PIL inverse-affine warp as the no-cv2 fallback)."""

    def __init__(
        self,
        degrees: float = 10.0,
        translate: float = 0.1,
        scales: Tuple[float, float] = (0.5, 1.5),
        shear: float = 2.0,
        target_size: Optional[Tuple[int, int]] = (640, 640),
        border_value: int = 114,
    ):
        self.degrees = degrees
        self.translate = translate
        self.scales = scales if isinstance(scales, (tuple, list)) else (1 - scales, 1 + scales)
        self.shear = shear
        self.target_size = tuple(target_size) if target_size else None
        self.border_value = border_value

    def __call__(self, sample, additional=()):
        h, w = sample.image.shape[:2]
        th, tw = self.target_size or (h, w)

        angle = random.uniform(-self.degrees, self.degrees)
        scale = random.uniform(*self.scales)
        shear_x = math_tan(random.uniform(-self.shear, self.shear))
        shear_y = math_tan(random.uniform(-self.shear, self.shear))
        tx = random.uniform(0.5 - self.translate, 0.5 + self.translate) * tw
        ty = random.uniform(0.5 - self.translate, 0.5 + self.translate) * th

        import math as _m

        a = _m.radians(angle)
        # forward matrix: M = T(tx,ty) @ Shear @ Rot*scale @ T(-cx,-cy)
        cx, cy = w / 2, h / 2
        rot = np.array([[scale * _m.cos(a), -scale * _m.sin(a)], [scale * _m.sin(a), scale * _m.cos(a)]])
        sh = np.array([[1, shear_x], [shear_y, 1]])
        m2 = sh @ rot
        m = np.eye(3)
        m[:2, :2] = m2
        m[:2, 2] = [tx - cx * m2[0, 0] - cy * m2[0, 1], ty - cx * m2[1, 0] - cy * m2[1, 1]]

        if cv2 is not None:
            # forward-matrix warp on the SIMD path (the other hot op behind the r04
            # loader-wait regression — PIL's Image.transform is ~10x slower here)
            out_img = cv2.warpAffine(
                sample.image.astype(np.uint8), m[:2], dsize=(tw, th),
                flags=cv2.INTER_LINEAR, borderValue=(self.border_value,) * 3,
            )
        else:
            from PIL import Image

            # PIL transform wants the INVERSE map (output -> input)
            minv = np.linalg.inv(m)
            img = Image.fromarray(sample.image.astype(np.uint8)).transform(
                (tw, th), Image.AFFINE, data=minv[:2].reshape(-1).tolist(), resample=Image.BILINEAR,
                fillcolor=(self.border_value,) * 3,
            )
            out_img = np.asarray(img)

        if len(sample.bboxes_xyxy):
            corners = np.stack(
                [
                    sample.bboxes_xyxy[:, [0, 1]],
                    sample.bboxes_xyxy[:, [2, 1]],
                    sample.bboxes_xyxy[:, [0, 3]],
                    sample.bboxes_xyxy[:, [2, 3]],
                ],
                axis=1,
            )  # [N, 4, 2]
            ones = np.ones((*corners.shape[:2], 1))
            pts = np.concatenate([corners, ones], -1) @ m.T  # [N, 4, 3]
            xy = pts[..., :2]
            new_boxes = np.concatenate([xy.min(1), xy.max(1)], -1).astype(np.float32)
            new_boxes[:, [0, 2]] = new_boxes[:, [0, 2]].clip(0, tw)
            new_boxes[:, [1, 3]] = new_boxes[:, [1, 3]].clip(0, th)
        else:
            new_boxes = sample.bboxes_xyxy
        return DetectionSample(out_img, new_boxes, sample.labels, sample.is_crowd).filter_valid(2.0)


def math_tan(deg: float) -> float:
    import math

    return math.tan(math.radians(deg))


@register_transform("DetectionMixup")
class DetectionMixup(DetectionTransform):
    """Image blend mixup (ref :693)."""

    additional_samples_count = 1

    def __init__(self, prob: float = 0.5, mixup_scale: Tuple[float, float] = (0.5, 1.5)):
        self.prob = prob
        self.mixup_scale = mixup_scale

    def __call__(self, sample, additional=()):
        if random.random() >= self.prob or not additional:
            return sample
        other = additional[0]
        h = max(sample.image.shape[0], other.image.shape[0])
        w = max(sample.image.shape[1], other.image.shape[1])
        if cv2 is not None and sample.image.dtype == np.uint8 and other.image.dtype == np.uint8:
            # uint8 SIMD blend — avoids two 5MB float32 canvases per sample
            canvas_a = np.full((h, w, 3), 114, np.uint8)
            canvas_b = np.full((h, w, 3), 114, np.uint8)
            canvas_a[: sample.image.shape[0], : sample.image.shape[1]] = sample.image
            canvas_b[: other.image.shape[0], : other.image.shape[1]] = other.image
            blended = cv2.addWeighted(canvas_a, 0.5, canvas_b, 0.5, 0.0)
        else:
            canvas_a = np.full((h, w, 3), 114, np.float32)
            canvas_b = np.full((h, w, 3), 114, np.float32)
            canvas_a[: sample.image.shape[0], : sample.image.shape[1]] = sample.image
            canvas_b[: other.image.shape[0], : other.image.shape[1]] = other.image
            blended = (canvas_a * 0.5 + canvas_b * 0.5).astype(sample.image.dtype)
        boxes = np.concatenate([sample.bboxes_xyxy, other.bboxes_xyxy])
        labels = np.concatenate([sample.labels, other.labels])
        return DetectionSample(blended, boxes.astype(np.float32), labels.astype(np.int32))


class ComposeDetectionTransforms:
    def __init__(self, transforms: Sequence[DetectionTransform]):
        self.transforms = list(transforms)

    @property
    def additional_samples_count(self) -> int:
        return max([t.additional_samples_count for t in self.transforms] + [0])

    @property
    def trailing_standardize(self) -> Optional["DetectionStandardize"]:
        """The chain's final DetectionStandardize, if any — the Trainer hoists it
        into the jitted step (uint8 host batches, on-device x*1/max_value) so the
        host pipeline skips a full f32 image pass and H2D ships 1 byte/px."""
        if self.transforms and isinstance(self.transforms[-1], DetectionStandardize):
            return self.transforms[-1]
        return None

    def __call__(
        self,
        sample: DetectionSample,
        additional: Sequence[DetectionSample] = (),
        skip_trailing_standardize: bool = False,
    ) -> DetectionSample:
        transforms = self.transforms
        if skip_trailing_standardize and self.trailing_standardize is not None:
            transforms = transforms[:-1]
        for t in transforms:
            n = t.additional_samples_count
            t_additional = additional[:n] if n else ()
            sample = t(sample, t_additional)
        return sample
