"""On-device image preprocessing ops.

The reference does all of this on CPU with cv2/numpy per image
(``training/processing/processing.py:205-700``: ReverseImageChannels, Standardize,
Normalize, DetectionLongestMaxSizeRescale, DetectionBottomRightPadding ...). Here the
same transforms are jittable jnp functions so the whole predict program —
preprocess → forward → decode → NMS — compiles into ONE XLA executable (SURVEY §7
north-star). Shapes are static per (input-size, target-size) pair; jit caches one
executable per shape.

Convention: images are NHWC (TPU-friendly), float32 or uint8 on entry.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


class PreprocessMetadata(NamedTuple):
    """What postprocess needs to undo rescale+pad (per image)."""

    scale: jnp.ndarray  # [] or [B] resize factor applied
    pad_top: jnp.ndarray
    pad_left: jnp.ndarray
    original_hw: jnp.ndarray  # [2] or [B, 2] int32


def standardize(image: jnp.ndarray, max_value: float = 255.0) -> jnp.ndarray:
    """x / max_value (ref ``StandardizeImage``, processing.py:260)."""
    return image.astype(jnp.float32) / max_value


def normalize(image: jnp.ndarray, mean: Sequence[float], std: Sequence[float]) -> jnp.ndarray:
    """(x - mean) / std over channels (ref ``NormalizeImage``, processing.py:298)."""
    mean_a = jnp.asarray(mean, dtype=jnp.float32)
    std_a = jnp.asarray(std, dtype=jnp.float32)
    return (image.astype(jnp.float32) - mean_a) / std_a


def reverse_channels(image: jnp.ndarray) -> jnp.ndarray:
    """BGR↔RGB (ref ``ReverseImageChannels``, processing.py:230)."""
    return image[..., ::-1]


def rescale_image(image: jnp.ndarray, output_hw: Tuple[int, int], method: str = "linear") -> jnp.ndarray:
    """Resize HWC / NHWC image to ``output_hw`` (antialias off to match cv2.INTER_LINEAR)."""
    if image.ndim == 3:
        shape = (output_hw[0], output_hw[1], image.shape[-1])
    else:
        shape = (image.shape[0], output_hw[0], output_hw[1], image.shape[-1])
    return jax.image.resize(image.astype(jnp.float32), shape, method=method)


def letterbox(
    image: jnp.ndarray,
    target_hw: Tuple[int, int],
    pad_value: float = 114.0,
    center: bool = False,
) -> Tuple[jnp.ndarray, PreprocessMetadata]:
    """Longest-max-size rescale + pad to target (ref ``DetectionLongestMaxSizeRescale``
    + ``DetectionBottomRightPadding``/``DetectionCenterPadding``, processing.py:326+).

    Input HWC [H, W, C]; returns ([th, tw, C], metadata). All shape math happens at
    trace time (static), so the op compiles to resize+pad with no dynamic shapes.
    """
    h, w = int(image.shape[0]), int(image.shape[1])
    th, tw = target_hw
    scale = min(th / h, tw / w)
    nh, nw = round(h * scale), round(w * scale)
    resized = rescale_image(image, (nh, nw))
    if center:
        pad_top, pad_left = (th - nh) // 2, (tw - nw) // 2
    else:
        pad_top, pad_left = 0, 0
    padded = jnp.full((th, tw, image.shape[-1]), pad_value, dtype=resized.dtype)
    padded = jax.lax.dynamic_update_slice(padded, resized, (pad_top, pad_left, 0))
    meta = PreprocessMetadata(
        scale=jnp.float32(scale),
        pad_top=jnp.int32(pad_top),
        pad_left=jnp.int32(pad_left),
        original_hw=jnp.asarray([h, w], dtype=jnp.int32),
    )
    return padded, meta


def undo_letterbox_boxes(boxes: jnp.ndarray, meta: PreprocessMetadata) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed coords back to original-image coords, clipped.

    Works per image ([..., 4] with scalar meta) or batched via vmap.
    """
    shift = jnp.stack([meta.pad_left, meta.pad_top, meta.pad_left, meta.pad_top]).astype(boxes.dtype)
    out = (boxes - shift) / meta.scale
    h = meta.original_hw[0].astype(boxes.dtype)
    w = meta.original_hw[1].astype(boxes.dtype)
    return jnp.stack(
        [
            jnp.clip(out[..., 0], 0, w),
            jnp.clip(out[..., 1], 0, h),
            jnp.clip(out[..., 2], 0, w),
            jnp.clip(out[..., 3], 0, h),
        ],
        axis=-1,
    )


def undo_letterbox_keypoints(kpts: jnp.ndarray, meta: PreprocessMetadata) -> jnp.ndarray:
    """Map [..., K, 2+] keypoints back to original-image coords (xy in first 2 chans)."""
    shift = jnp.stack([meta.pad_left, meta.pad_top]).astype(kpts.dtype)
    xy = (kpts[..., :2] - shift) / meta.scale
    return jnp.concatenate([xy, kpts[..., 2:]], axis=-1) if kpts.shape[-1] > 2 else xy
