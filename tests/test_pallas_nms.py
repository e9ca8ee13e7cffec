"""Pallas blocked exact-NMS kernel: parity vs the XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu.ops.nms import _exact_keep_mask
from super_gradients_tpu.ops.bbox import box_iou
from super_gradients_tpu.ops.pallas.nms_kernel import pallas_exact_nms_keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_nms_matches_xla_exact(seed):
    rng = np.random.RandomState(seed)
    b, k = 2, 256
    centers = rng.rand(b, k, 2) * 300
    wh = rng.rand(b, k, 2) * 80 + 10
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    scores = -np.sort(-rng.rand(b, k).astype(np.float32), axis=1)  # already desc
    valid = scores > 0.1

    keep_pallas = pallas_exact_nms_keep(jnp.asarray(boxes), jnp.asarray(valid), iou_threshold=0.5, interpret=True)

    for i in range(b):
        iou = box_iou(jnp.asarray(boxes[i]), jnp.asarray(boxes[i]))
        ref = _exact_keep_mask(iou, jnp.asarray(valid[i]), 0.5)
        np.testing.assert_array_equal(np.asarray(keep_pallas[i]) > 0, np.asarray(ref))


def test_pallas_nms_suppression_chain():
    """A-B overlap, B-C overlap, A-C don't: greedy keeps A and C (reactivation)."""
    boxes = np.zeros((1, 128, 4), np.float32)
    boxes[0, 0] = [0, 0, 10, 10]   # A (highest score)
    boxes[0, 1] = [3, 0, 13, 10]   # B: IoU(A,B)=0.54 -> suppressed
    boxes[0, 2] = [8, 0, 18, 10]   # C: IoU(B,C)=0.33 but IoU(A,C)=0.11 -> kept
    valid = np.zeros((1, 128), bool)
    valid[0, :3] = True
    keep = np.asarray(pallas_exact_nms_keep(jnp.asarray(boxes), jnp.asarray(valid), iou_threshold=0.3, interpret=True))
    assert keep[0, :3].tolist() == [1.0, 0.0, 1.0]


def test_pallas_mode_reachable_from_batched_nms():
    """mode="pallas" is a product-path option of ops.nms.batched_nms (not an
    orphan kernel) and agrees with mode="exact"."""
    from super_gradients_tpu.ops.nms import batched_nms

    rng = np.random.RandomState(7)
    boxes = rng.rand(2, 200, 4).astype(np.float32) * 100
    boxes[..., 2:] += boxes[..., :2]
    scores = rng.rand(2, 200, 5).astype(np.float32)
    exact = batched_nms(jnp.asarray(boxes), jnp.asarray(scores), mode="exact",
                        score_threshold=0.3, nms_top_k=256, max_predictions=20)
    pallas = batched_nms(jnp.asarray(boxes), jnp.asarray(scores), mode="pallas",
                         score_threshold=0.3, nms_top_k=256, max_predictions=20)
    np.testing.assert_array_equal(np.asarray(exact.num_detections), np.asarray(pallas.num_detections))
    np.testing.assert_allclose(np.asarray(exact.scores), np.asarray(pallas.scores), atol=1e-6)
