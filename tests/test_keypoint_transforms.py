import random

import numpy as np

from super_gradients_tpu.training.transforms.keypoints import (
    ComposeKeypointTransforms,
    KeypointsHorizontalFlip,
    KeypointsLongestMaxSize,
    KeypointsPadIfNeeded,
    KeypointsRemoveSmallObjects,
    PoseSample,
)


def _sample():
    rng = np.random.RandomState(0)
    img = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
    boxes = np.asarray([[10, 20, 60, 90]], np.float32)
    joints = np.zeros((1, 17, 3), np.float32)
    joints[0, :, 0] = np.linspace(15, 55, 17)
    joints[0, :, 1] = np.linspace(25, 85, 17)
    joints[0, :, 2] = 2
    return PoseSample(img, boxes, joints)


def test_hflip_swaps_pairs_and_coords():
    random.seed(0)
    s = _sample()
    t = KeypointsHorizontalFlip(prob=1.0)
    f = t(s)
    # x mirrored
    np.testing.assert_allclose(f.joints[0, 0, 0], 120 - s.joints[0, 0, 0])
    # left-eye (idx 1) and right-eye (idx 2) swapped
    np.testing.assert_allclose(f.joints[0, 1, 1], s.joints[0, 2, 1])
    # double flip restores
    ff = t(f)
    np.testing.assert_allclose(ff.joints, s.joints, atol=1e-4)


def test_resize_pad_pipeline():
    s = _sample()
    pipe = ComposeKeypointTransforms([
        KeypointsLongestMaxSize(64, 64),
        KeypointsPadIfNeeded(64, 64),
    ])
    out = pipe(s)
    assert out.image.shape == (64, 64, 3)
    scale = 64 / 120
    np.testing.assert_allclose(out.joints[0, 0, :2], s.joints[0, 0, :2] * scale, rtol=1e-3)


def test_remove_small_objects_and_padding():
    s = _sample()
    s.joints[0, :, 2] = 0  # nothing visible
    out = KeypointsRemoveSmallObjects(min_visible_joints=1)(s)
    assert len(out.boxes_xyxy) == 0
    padded = out.to_padded_targets(4)
    assert padded.shape == (4, 5 + 51)
    assert (padded[:, 0] == -1).all()
