"""YoloXDetectionLoss — SimOTA dynamic-k assignment, fully batched & masked.

Reference: ``training/losses/yolox_loss.py`` (1043 LoC; SimOTA: center-prior
candidates, cost = cls BCE + 3·(-log IoU) + ∞·outside-prior, dynamic-k from the sum
of top-10 IoUs per gt, lowest-cost ties resolved per anchor). Losses: obj BCE over
all anchors, cls BCE + IoU loss on positives, normalized by num_fg.

Targets: padded [B, max_boxes, 5] (cls, x1, y1, x2, y2; -1 pad) as everywhere in
this framework. Every data-dependent step is a masked dense op (top-k + one-hot),
so one XLA program covers all batches (no per-image loops, SURVEY §7).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_loss
from super_gradients_tpu.ops.bbox import box_iou
from super_gradients_tpu.training.losses.ppyolo_loss import _bce_with_logits


@register_loss("YoloXDetectionLoss")
@register_loss("YoloXFastDetectionLoss")
class YoloXDetectionLoss:
    component_names = ["iou", "obj", "cls", "l1", "num_fg", "Loss"]

    def __init__(
        self,
        num_classes: int = 80,
        strides=(8, 16, 32),
        center_radius: float = 2.5,
        simota_topk: int = 10,
        iou_weight: float = 5.0,
        obj_weight: float = 1.0,
        cls_weight: float = 1.0,
        use_l1: bool = False,
    ):
        self.num_classes = num_classes
        self.center_radius = center_radius
        self.topk = simota_topk
        self.iou_weight = iou_weight
        self.obj_weight = obj_weight
        self.cls_weight = cls_weight
        self.use_l1 = use_l1

    def _assign(self, pred_boxes, pred_scores, points_px, strides, gt_boxes, gt_labels, pad_mask):
        """SimOTA per batch. Returns fg_mask [B,A], matched_gt [B,A], matched_iou [B,A]."""
        b, a, _ = pred_boxes.shape
        n = gt_boxes.shape[1]

        # center prior: anchor center inside gt box OR within center_radius*stride of gt center
        px, py = points_px[:, 0], points_px[:, 1]
        in_box = (
            (px[None, None, :] >= gt_boxes[..., 0:1])
            & (px[None, None, :] <= gt_boxes[..., 2:3])
            & (py[None, None, :] >= gt_boxes[..., 1:2])
            & (py[None, None, :] <= gt_boxes[..., 3:4])
        )  # [B, n, A]
        gcx = (gt_boxes[..., 0] + gt_boxes[..., 2]) * 0.5
        gcy = (gt_boxes[..., 1] + gt_boxes[..., 3]) * 0.5
        r = self.center_radius * strides[:, 0]  # [A]
        in_center = (jnp.abs(px[None, None, :] - gcx[..., None]) < r[None, None, :]) & (
            jnp.abs(py[None, None, :] - gcy[..., None]) < r[None, None, :]
        )
        prior = (in_box | in_center) & (pad_mask[..., None] > 0)  # [B, n, A]

        ious = box_iou(gt_boxes, pred_boxes) * pad_mask[..., None]  # [B, n, A]
        iou_cost = -jnp.log(ious + 1e-8)

        gt_onehot = jax.nn.one_hot(gt_labels, self.num_classes)  # [B, n, C]
        # cls cost: BCE between pred joint score and gt one-hot, summed over classes
        p = jnp.sqrt(jnp.clip(pred_scores, 1e-8, 1.0))  # [B, A, C]
        bce = -(gt_onehot[:, :, None, :] * jnp.log(p[:, None]) + (1 - gt_onehot[:, :, None, :]) * jnp.log(1 - p[:, None] + 1e-8))
        cls_cost = jnp.sum(bce, -1)  # [B, n, A]

        cost = cls_cost + 3.0 * iou_cost + 1e6 * (~prior)

        # dynamic k per gt: sum of top-10 candidate IoUs (clipped >= 1)
        k = min(self.topk, a)
        topk_ious, _ = jax.lax.top_k(jnp.where(prior, ious, 0.0), k)
        dynamic_k = jnp.clip(jnp.sum(topk_ious, -1).astype(jnp.int32), 1, k)  # [B, n]

        # pick the dynamic_k lowest-cost anchors per gt
        neg_cost, cand_idx = jax.lax.top_k(-cost, k)  # [B, n, k] best (lowest cost) first
        rank = jnp.arange(k)[None, None, :]
        chosen = rank < dynamic_k[..., None]  # [B, n, k]
        matching = jnp.sum(jax.nn.one_hot(cand_idx, a) * chosen[..., None], axis=2)  # [B, n, A]
        matching = matching * prior

        # resolve anchors matched to multiple gts: keep lowest-cost gt
        multi = jnp.sum(matching, 1, keepdims=True) > 1  # [B, 1, A]
        best_gt = jnp.argmin(jnp.where(matching > 0, cost, 1e9), axis=1)  # [B, A]
        keep_best = jnp.moveaxis(jax.nn.one_hot(best_gt, n), -1, 1)  # [B, n, A]
        matching = jnp.where(multi, matching * keep_best, matching)

        fg_mask = jnp.sum(matching, 1) > 0  # [B, A]
        matched_gt = jnp.argmax(matching, 1)  # [B, A]
        matched_iou = jnp.max(ious * matching, 1)  # [B, A]
        return fg_mask, matched_gt, matched_iou

    def __call__(self, outputs, targets: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        gt_labels = jnp.maximum(targets[..., 0], 0).astype(jnp.int32)
        gt_boxes = targets[..., 1:5]
        pad_mask = (targets[..., 0] >= 0).astype(jnp.float32)

        pred_boxes = outputs.pred_bboxes
        pred_scores = jax.lax.stop_gradient(outputs.pred_scores)
        points_px = outputs.anchor_points * outputs.stride_tensor[:, 0:1] + outputs.stride_tensor * 0.5

        fg, matched_gt, matched_iou = jax.lax.stop_gradient(
            self._assign(jax.lax.stop_gradient(pred_boxes), pred_scores, points_px, outputs.stride_tensor, gt_boxes, gt_labels, pad_mask)
        )
        fg_f = fg.astype(jnp.float32)
        num_fg = jnp.maximum(jnp.sum(fg_f), 1.0)

        # obj: BCE to fg mask over all anchors
        obj_loss = jnp.sum(_bce_with_logits(outputs.obj_logits, fg_f)) / num_fg

        # cls: BCE on positives with one-hot target
        tgt_labels = jnp.take_along_axis(gt_labels, matched_gt, axis=1)  # [B, A]
        tgt_onehot = jax.nn.one_hot(tgt_labels, self.num_classes)
        cls_loss = jnp.sum(jnp.sum(_bce_with_logits(outputs.cls_logits, tgt_onehot), -1) * fg_f) / num_fg

        # IoU loss on positives
        from super_gradients_tpu.ops.bbox import elementwise_iou

        tgt_boxes = jnp.take_along_axis(gt_boxes, matched_gt[..., None], axis=1)  # [B, A, 4]
        iou = elementwise_iou(pred_boxes, tgt_boxes)
        iou_loss = jnp.sum((1.0 - iou**2) * fg_f) / num_fg

        loss = self.iou_weight * iou_loss + self.obj_weight * obj_loss + self.cls_weight * cls_loss
        aux = {"iou": iou_loss, "obj": obj_loss, "cls": cls_loss, "num_fg": num_fg}
        if self.use_l1:
            st = outputs.stride_tensor
            tcx = (tgt_boxes[..., 0] + tgt_boxes[..., 2]) * 0.5
            tcy = (tgt_boxes[..., 1] + tgt_boxes[..., 3]) * 0.5
            tw = tgt_boxes[..., 2] - tgt_boxes[..., 0]
            th = tgt_boxes[..., 3] - tgt_boxes[..., 1]
            l1_target = jnp.stack(
                [
                    tcx / st[None, :, 0] - outputs.anchor_points[None, :, 0],
                    tcy / st[None, :, 0] - outputs.anchor_points[None, :, 1],
                    jnp.log(jnp.clip(tw / st[None, :, 0], 1e-8)),
                    jnp.log(jnp.clip(th / st[None, :, 0], 1e-8)),
                ],
                -1,
            )
            l1 = jnp.sum(jnp.abs(outputs.reg_raw - l1_target) * fg_f[..., None]) / num_fg
            loss = loss + l1
            aux["l1"] = l1
        return loss, aux
