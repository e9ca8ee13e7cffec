import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu.ops import bbox


def test_conversion_roundtrip():
    rng = np.random.RandomState(0)
    xy = rng.rand(16, 4).astype(np.float32) * 100
    boxes = np.concatenate([xy[:, :2], xy[:, :2] + np.abs(xy[:, 2:]) + 1], axis=1)
    for fmt in ["cxcywh", "xywh", "yxyx"]:
        out = bbox.convert_bboxes(jnp.asarray(boxes), "xyxy", fmt)
        back = bbox.convert_bboxes(out, fmt, "xyxy")
        np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-5, atol=1e-4)


def test_iou_known_values():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(bbox.box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_iou_matches_torch_reference_semantics():
    """Golden check against an independent numpy implementation."""
    rng = np.random.RandomState(1)
    n, m = 50, 30
    a = rng.rand(n, 4) * 100
    b = rng.rand(m, 4) * 100
    a = np.concatenate([np.minimum(a[:, :2], a[:, 2:]), np.maximum(a[:, :2], a[:, 2:])], 1)
    b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]), np.maximum(b[:, :2], b[:, 2:])], 1)

    def np_iou(a, b):
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (area_a[:, None] + area_b[None, :] - inter)

    got = np.asarray(bbox.box_iou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-4, atol=1e-5)


def test_giou_leq_iou():
    rng = np.random.RandomState(2)
    a = np.sort(rng.rand(20, 4) * 50, axis=-1)[:, [0, 1, 2, 3]].astype(np.float32)
    a = np.concatenate([a[:, :2], a[:, :2] + a[:, 2:] + 1], 1)
    giou = np.asarray(bbox.box_giou(jnp.asarray(a), jnp.asarray(a)))
    iou = np.asarray(bbox.box_iou(jnp.asarray(a), jnp.asarray(a)))
    assert np.all(giou <= iou + 1e-6)
    np.testing.assert_allclose(np.diag(giou), 1.0, atol=1e-5)


def test_distance2bbox_roundtrip():
    points = jnp.asarray([[10.0, 10.0], [50.0, 40.0]])
    dist = jnp.asarray([[2.0, 3.0, 4.0, 5.0], [10.0, 10.0, 10.0, 10.0]])
    boxes = bbox.batch_distance2bbox(points, dist)
    np.testing.assert_allclose(np.asarray(boxes[0]), [8, 7, 14, 15])
    back = bbox.batch_bbox2distance(points, boxes)
    np.testing.assert_allclose(np.asarray(back), np.asarray(dist), atol=1e-5)


def test_elementwise_ciou_range():
    a = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 5, 5]])
    b = jnp.asarray([[0.0, 0, 10, 10], [20, 20, 30, 30]])
    ciou = np.asarray(bbox.elementwise_ciou(a, b))
    assert abs(ciou[0] - 1.0) < 1e-5
    assert ciou[1] < 0  # disjoint + center distance penalty
