"""Golden parity test: our jit-pure PPYoloELoss vs the reference torch implementation.

The reference file is loaded standalone (its super_gradients imports stubbed) so we
compare against the ACTUAL reference math, not a re-derivation. See SURVEY §4
("golden tests vs reference outputs on fixtures").
"""

import importlib.util
import sys
import types
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF_LOSS_PATH = "/root/reference/src/super_gradients/training/losses/ppyolo_loss.py"


def _load_reference_loss_module():
    """Import the reference ppyolo_loss.py with its package imports stubbed."""

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    def cxcywh_to_xyxy(bboxes, image_shape=None):
        cx, cy, w, h = bboxes[..., 0], bboxes[..., 1], bboxes[..., 2], bboxes[..., 3]
        return torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], dim=-1)

    def batch_distance2bbox(points, distance):
        lt, rb = distance[..., :2], distance[..., 2:]
        return torch.cat([points - lt, points + rb], dim=-1)

    sg = mod("super_gradients", is_distributed=lambda: False)
    mod("super_gradients.common")
    mod("super_gradients.common.environment")
    mod("super_gradients.common.environment.ddp_utils", get_world_size=lambda: 1)
    mod("super_gradients.common.object_names", Losses=SimpleNamespace(PPYOLOE_LOSS="PPYoloELoss"))
    mod("super_gradients.common.registry")
    mod(
        "super_gradients.common.registry.registry",
        register_loss=lambda *a, **k: (lambda cls: cls),
    )
    mod("super_gradients.training")
    mod("super_gradients.training.datasets")
    mod("super_gradients.training.datasets.data_formats")
    mod("super_gradients.training.datasets.data_formats.bbox_formats")
    mod("super_gradients.training.datasets.data_formats.bbox_formats.cxcywh", cxcywh_to_xyxy=cxcywh_to_xyxy)
    mod("super_gradients.training.utils")
    mod("super_gradients.training.utils.bbox_utils", batch_distance2bbox=batch_distance2bbox)

    spec = importlib.util.spec_from_file_location("ref_ppyolo_loss", REF_LOSS_PATH)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _make_fixture(seed=0, b=2, c=8, reg_max=4):
    rng = np.random.RandomState(seed)
    levels = [((8, 8), 8.0), ((4, 4), 16.0)]  # >= ATSS topk anchors per level
    points, strides, num_anchors_list = [], [], []
    for (h, w), s in levels:
        gy, gx = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5, indexing="ij")
        points.append(np.stack([gx, gy], -1).reshape(-1, 2))
        strides.append(np.full((h * w, 1), s))
        num_anchors_list.append(h * w)
    points_s = np.concatenate(points).astype(np.float32)  # stride units
    stride_t = np.concatenate(strides).astype(np.float32)
    L = points_s.shape[0]

    cls_logits = rng.randn(b, L, c).astype(np.float32)
    reg_distri = rng.randn(b, L, 4 * (reg_max + 1)).astype(np.float32)

    # ground truth: 2-3 boxes per image in pixel coords (image ~32x32)
    max_boxes = 4
    padded = np.full((b, max_boxes, 5), -1.0, dtype=np.float32)
    flat_rows = []
    for i in range(b):
        n = rng.randint(2, 4)
        cxy = rng.rand(n, 2) * 20 + 6
        wh = rng.rand(n, 2) * 12 + 4
        cls_ids = rng.randint(0, c, size=n)
        x1y1 = cxy - wh / 2
        x2y2 = cxy + wh / 2
        padded[i, :n, 0] = cls_ids
        padded[i, :n, 1:3] = x1y1
        padded[i, :n, 3:5] = x2y2
        for j in range(n):
            flat_rows.append([i, cls_ids[j], cxy[j, 0], cxy[j, 1], wh[j, 0], wh[j, 1]])
    flat_targets = np.asarray(flat_rows, dtype=np.float32)
    return points_s, stride_t, num_anchors_list, cls_logits, reg_distri, padded, flat_targets


@pytest.mark.parametrize("use_static", [False, True])
def test_ppyolo_loss_matches_reference(use_static):
    ref_mod = _load_reference_loss_module()
    points_s, stride_t, nal, cls_logits, reg_distri, padded, flat = _make_fixture()
    c, reg_max = 8, 4

    # ---- reference
    ref_loss = ref_mod.PPYoloELoss(num_classes=c, use_static_assigner=use_static, use_batched_assignment=True)
    anchors_px = np.concatenate(
        [
            points_s * stride_t - 0.5 * 5.0 * stride_t,
            points_s * stride_t + 0.5 * 5.0 * stride_t,
        ],
        axis=-1,
    ).astype(np.float32)
    predictions = (
        torch.from_numpy(cls_logits),
        torch.from_numpy(reg_distri),
        torch.from_numpy(anchors_px),
        torch.from_numpy((points_s * stride_t).astype(np.float32)),
        nal,
        torch.from_numpy(stride_t),
    )
    ref_total, ref_components = ref_loss(predictions, torch.from_numpy(flat))
    ref_cls, ref_iou, ref_dfl, _ = [float(x) for x in ref_components]

    # ---- ours
    from super_gradients_tpu.training.losses.ppyolo_loss import PPYoloELoss

    outputs = SimpleNamespace(
        cls_logits=jnp.asarray(cls_logits),
        reg_distri=jnp.asarray(reg_distri),
        anchor_points=jnp.asarray(points_s),
        stride_tensor=jnp.asarray(stride_t),
        num_anchors_list=tuple(nal),
    )
    ours = PPYoloELoss(num_classes=c, use_static_assigner=use_static)
    total, aux = ours(outputs, jnp.asarray(padded))

    np.testing.assert_allclose(float(aux["loss_cls"]), ref_cls, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux["loss_iou"]), ref_iou, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(aux["loss_dfl"]), ref_dfl, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-4, atol=1e-5)


def test_loss_is_jittable_and_differentiable():
    import jax

    from super_gradients_tpu.training.losses.ppyolo_loss import PPYoloELoss

    points_s, stride_t, nal, cls_logits, reg_distri, padded, _ = _make_fixture(seed=3)
    loss = PPYoloELoss(num_classes=8)

    def f(cl, rd):
        outputs = SimpleNamespace(
            cls_logits=cl,
            reg_distri=rd,
            anchor_points=jnp.asarray(points_s),
            stride_tensor=jnp.asarray(stride_t),
            num_anchors_list=tuple(nal),
        )
        total, _ = loss(outputs, jnp.asarray(padded))
        return total

    g = jax.jit(jax.grad(f, argnums=(0, 1)))
    g_cl, g_rd = g(jnp.asarray(cls_logits), jnp.asarray(reg_distri))
    assert np.isfinite(np.asarray(g_cl)).all()
    assert np.isfinite(np.asarray(g_rd)).all()
    assert float(jnp.abs(g_cl).sum()) > 0 and float(jnp.abs(g_rd).sum()) > 0
