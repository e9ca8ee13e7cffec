"""Segmentation transform tests (ref test strategy: transforms preserve mask
semantics — nearest interpolation, ignore-index fill on exposed pixels)."""

import random

import numpy as np
import pytest

from super_gradients_tpu.training.transforms.segmentation import (
    SegColorJitter,
    SegCompose,
    SegCropImageAndMask,
    SegNormalize,
    SegPadShortToCropSize,
    SegPadToDivisible,
    SegRandomFlip,
    SegRandomGaussianBlur,
    SegRandomRescale,
    SegRandomRotate,
    SegRescale,
    SegResize,
    SegSample,
    SegStandardize,
)


def _sample(h=40, w=60, num_classes=5):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    mask = rng.randint(0, num_classes, (h, w)).astype(np.int32)
    return SegSample(img, mask)


def test_resize_shapes_and_mask_classes():
    s = SegResize(h=32, w=48)(_sample())
    assert s.image.shape == (32, 48, 3) and s.mask.shape == (32, 48)
    assert set(np.unique(s.mask)) <= set(range(5))  # NEAREST keeps exact ids


def test_random_flip_is_involution():
    random.seed(0)
    s0 = _sample()
    s1 = SegRandomFlip(prob=1.0)(s0)
    s2 = SegRandomFlip(prob=1.0)(s1)
    np.testing.assert_array_equal(s2.mask, s0.mask)
    assert not np.array_equal(s1.mask, s0.mask)


def test_rescale_short_and_long_size():
    s = SegRescale(short_size=20)(_sample(40, 60))
    assert min(s.mask.shape) == 20
    s = SegRescale(long_size=30)(_sample(40, 60))
    assert max(s.mask.shape) == 30


def test_random_rescale_within_bounds():
    random.seed(1)
    t = SegRandomRescale(scales=(0.5, 2.0))
    for _ in range(5):
        s = t(_sample(40, 60))
        assert 20 <= s.mask.shape[0] <= 80


def test_random_rescale_scalar_arg_normalized():
    t = SegRandomRescale(scales=2.0)
    assert t.scales == (0.5, 2.0)
    with pytest.raises(ValueError):
        SegRandomRescale(scales=(-1.0, 2.0))


def test_rotate_fills_mask_with_ignore():
    random.seed(0)
    s = SegRandomRotate(min_deg=30, max_deg=30, fill_mask=255)(_sample())
    assert (s.mask == 255).any()  # exposed corners are void
    valid = s.mask[s.mask != 255]
    assert set(np.unique(valid)) <= set(range(5))


def test_crop_random_and_center():
    random.seed(0)
    s = SegCropImageAndMask(crop_size=(16, 24), mode="random")(_sample())
    assert s.mask.shape == (16, 24) and s.image.shape == (16, 24, 3)
    s = SegCropImageAndMask(crop_size=16, mode="center")(_sample())
    assert s.mask.shape == (16, 16)
    with pytest.raises(ValueError):
        SegCropImageAndMask(crop_size=16, mode="bogus")


def test_pad_short_to_crop_size_centers_and_fills():
    s = SegPadShortToCropSize(crop_size=(64, 64), fill_mask=255)(_sample(40, 60))
    assert s.mask.shape == (64, 64)
    assert (s.mask[0] == 255).all() and (s.mask[-1] == 255).all()
    # original content survives in the middle
    assert set(np.unique(s.mask[12:52, 2:62])) <= set(range(5))


def test_pad_to_divisible():
    s = SegPadToDivisible(divisible_value=32, fill_mask=255)(_sample(40, 60))
    assert s.mask.shape[0] % 32 == 0 and s.mask.shape[1] % 32 == 0
    np.testing.assert_array_equal(s.mask[:40, :60], _sample().mask)  # top-left preserved


def test_color_jitter_image_only():
    random.seed(0)
    s0 = _sample()
    s = SegColorJitter(brightness=0.5, contrast=0.5, saturation=0.5, hue=0.1)(s0)
    np.testing.assert_array_equal(s.mask, s0.mask)
    assert not np.array_equal(s.image, s0.image)


def test_gaussian_blur_image_only():
    random.seed(0)
    s0 = _sample()
    s = SegRandomGaussianBlur(prob=1.0, sigma=(2.0, 2.0))(s0)
    np.testing.assert_array_equal(s.mask, s0.mask)
    assert s.image.std() < s0.image.std()  # blur reduces variance


def test_standardize_and_normalize():
    s = SegStandardize()(_sample())
    assert 0.0 <= s.image.min() and s.image.max() <= 1.0
    s = SegNormalize()(s)
    assert abs(float(s.image.mean())) < 3.0


def test_compose_tuple_protocol():
    img = np.zeros((40, 60, 3), np.float32)
    mask = np.zeros((40, 60), np.int32)
    pipeline = SegCompose([SegResize(32, 32), SegStandardize(), SegNormalize()])
    out_img, out_mask = pipeline(img, mask)
    assert out_img.shape == (32, 32, 3) and out_mask.shape == (32, 32)


def test_registered_in_transform_registry():
    from super_gradients_tpu.common.registry import TRANSFORMS

    for name in ("SegResize", "SegRandomFlip", "SegRandomRescale", "SegCropImageAndMask",
                 "SegPadShortToCropSize", "SegColorJitter", "SegNormalize"):
        assert name in TRANSFORMS


def test_depth_sample_and_transforms():
    from super_gradients_tpu.training.transforms.depth import (
        DepthEstimationSample,
        DepthHorizontalFlip,
        DepthRandomCrop,
        DepthResize,
    )

    img = np.random.RandomState(0).randint(0, 255, (40, 60, 3)).astype(np.float32)
    dm = np.random.RandomState(1).rand(40, 60, 1).astype(np.float32) * 10
    s = DepthEstimationSample(img, dm)
    assert s.depth_map.shape == (40, 60)  # [H,W,1] squeezed
    with pytest.raises(RuntimeError):
        DepthEstimationSample(img, np.zeros((40, 60, 3), np.float32))

    random.seed(0)
    s2 = DepthHorizontalFlip(prob=1.0)(s)
    np.testing.assert_allclose(s2.depth_map, s.depth_map[:, ::-1])
    s3 = DepthResize(h=20, w=30)(s)
    assert s3.depth_map.shape == (20, 30) and abs(s3.depth_map.mean() - s.depth_map.mean()) < 0.5
    s4 = DepthRandomCrop(16)(s)
    assert s4.depth_map.shape == (16, 16) and s4.image.shape == (16, 16, 3)
