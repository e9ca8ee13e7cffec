"""SSDLoss — anchor matching + hard-negative mining (batched, masked).

Reference: ``training/losses/ssd_loss.py`` (192 LoC): match each anchor to the best
gt by IoU (>= 0.5) plus force-match the best anchor per gt; smooth-L1 on encoded loc
deltas; CE on conf with 3:1 hard-negative mining (per image).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_loss
from super_gradients_tpu.ops.bbox import box_iou, cxcywh_to_xyxy, xyxy_to_cxcywh


@register_loss("SSDLoss")
class SSDLoss:
    def __init__(self, anchors_cxcywh=None, image_size: int = 320, scale_xy: float = 0.1, scale_wh: float = 0.2, alpha: float = 1.0, iou_thresh: float = 0.5, neg_pos_ratio: float = 3.0):
        if anchors_cxcywh is None:
            # recipes construct the loss from criterion_params only — generate the
            # default-box grid for ``image_size`` (must match the model's)
            from super_gradients_tpu.models.detection.ssd import generate_ssd_anchors

            anchors_cxcywh = generate_ssd_anchors(image_size)
        self.anchors = jnp.asarray(anchors_cxcywh)
        self.anchors_xyxy = cxcywh_to_xyxy(self.anchors)
        self.scale_xy, self.scale_wh = scale_xy, scale_wh
        self.alpha = alpha
        self.iou_thresh = iou_thresh
        self.neg_pos_ratio = neg_pos_ratio

    def _encode(self, gt_xyxy):
        g = xyxy_to_cxcywh(gt_xyxy)
        a = self.anchors
        dxy = (g[..., :2] - a[None, :, :2]) / a[None, :, 2:] / self.scale_xy
        dwh = jnp.log(jnp.clip(g[..., 2:] / a[None, :, 2:], 1e-8)) / self.scale_wh
        return jnp.concatenate([dxy, dwh], -1)

    def __call__(self, outputs, targets: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        gt_labels = jnp.maximum(targets[..., 0], 0).astype(jnp.int32)
        gt_boxes = targets[..., 1:5]
        pad = (targets[..., 0] >= 0).astype(jnp.float32)  # [B, n]

        conf_logits = outputs.cls_logits  # [B, A, C+1] raw
        loc_raw = outputs.reg_distri  # [B, A, 4]
        b, a, _ = loc_raw.shape

        ious = box_iou(gt_boxes, self.anchors_xyxy[None].repeat(b, 0)) * pad[..., None]  # [B, n, A]
        best_gt_iou = jnp.max(ious, 1)  # [B, A]
        best_gt_idx = jnp.argmax(ious, 1)
        # force best anchor per gt to match it
        best_anchor_per_gt = jnp.argmax(ious, 2)  # [B, n]
        force = jnp.sum(jax.nn.one_hot(best_anchor_per_gt, a) * pad[..., None], axis=1) > 0  # [B, A]

        pos = (best_gt_iou >= self.iou_thresh) | force  # [B, A]
        pos_f = pos.astype(jnp.float32)
        num_pos = jnp.maximum(jnp.sum(pos_f), 1.0)

        matched_boxes = jnp.take_along_axis(gt_boxes, best_gt_idx[..., None], 1)  # [B, A, 4]
        matched_labels = jnp.take_along_axis(gt_labels, best_gt_idx, 1) + 1  # +1: background=0
        conf_target = jnp.where(pos, matched_labels, 0)

        # smooth-L1 on encoded deltas (positives only)
        enc = self._encode(matched_boxes)
        diff = jnp.abs(loc_raw - enc)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).sum(-1)
        loc_loss = jnp.sum(sl1 * pos_f) / num_pos

        # conf CE with hard-negative mining 3:1 per image
        logp = jax.nn.log_softmax(conf_logits, -1)
        ce = -jnp.take_along_axis(logp, conf_target[..., None], -1)[..., 0]  # [B, A]
        neg_ce = jnp.where(pos, -jnp.inf, ce)
        order = jnp.argsort(-neg_ce, axis=1)
        rank = jnp.argsort(order, axis=1)
        n_neg = jnp.minimum(self.neg_pos_ratio * jnp.sum(pos_f, 1, keepdims=True), a - jnp.sum(pos_f, 1, keepdims=True))
        neg = rank < n_neg
        conf_loss = jnp.sum(ce * (pos_f + neg.astype(jnp.float32))) / num_pos

        loss = self.alpha * loc_loss + conf_loss
        return loss, {"loc_loss": loc_loss, "conf_loss": conf_loss}
