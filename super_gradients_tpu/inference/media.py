"""Image loading utilities (reference ``training/utils/media/image.py``).

Accepts: np.ndarray (HWC or NHWC), PIL image, file path, directory, or lists thereof.
Returns RGB uint8 HWC numpy arrays. URL loading is intentionally unsupported in this
environment (zero egress); pass local paths or arrays.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Union

import numpy as np

ImageSource = Union[str, np.ndarray, "PIL.Image.Image", list, tuple]

_IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def load_image(image: ImageSource) -> np.ndarray:
    if isinstance(image, np.ndarray):
        if image.ndim == 2:
            image = np.stack([image] * 3, axis=-1)
        if image.dtype != np.uint8:
            image = np.clip(image, 0, 255).astype(np.uint8)
        return image
    if isinstance(image, str):
        from PIL import Image

        with Image.open(image) as im:
            return np.asarray(im.convert("RGB"))
    try:
        from PIL import Image

        if isinstance(image, Image.Image):
            return np.asarray(image.convert("RGB"))
    except ImportError:
        pass
    raise TypeError(f"Unsupported image source type: {type(image)}")


def images_to_list(images: ImageSource) -> List[np.ndarray]:
    if isinstance(images, np.ndarray) and images.ndim == 4:
        return [load_image(im) for im in images]
    if isinstance(images, (list, tuple)):
        return [load_image(im) for im in images]
    if isinstance(images, str) and os.path.isdir(images):
        files = sorted(
            os.path.join(images, f) for f in os.listdir(images) if f.lower().endswith(_IMG_EXTENSIONS)
        )
        return [load_image(f) for f in files]
    return [load_image(images)]
