"""YoloNASPoseLoss — batched, padded, jit-pure.

Reference: ``training/losses/yolo_nas_pose_loss.py`` —
``YoloNASPoseTaskAlignedAssigner`` (:79, TAL with optional pose-OKS factor on IoUs),
``batch_pose_oks`` (:45), ``_keypoint_loss`` (:514: OKS-style regression
``1 - exp(-d²/(2σ)²/area/2)`` + per-joint visibility BCE), cls (focal) + GIoU + DFL
as in PPYoloELoss.

Targets: padded ``[B, max_poses, 5 + 3K]`` rows: (valid_flag(-1 pad / 0 person),
x1, y1, x2, y2, then K * (x, y, visibility)).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_loss
from super_gradients_tpu.models.class_names import COCO_POSE_SIGMAS
from super_gradients_tpu.training.losses.ppyolo_loss import (
    AssignResult,
    TaskAlignedAssigner,
    _bce_with_logits,
    batch_iou_similarity,
    check_points_inside_bboxes,
    compute_max_iou_anchor,
    df_loss,
    focal_loss,
    gather_topk_anchors,
    giou_loss,
    varifocal_loss,
    _gather_assigned,
)


def batch_pose_oks(gt_kpts: jnp.ndarray, pred_kpts: jnp.ndarray, gt_bboxes: jnp.ndarray, sigmas: jnp.ndarray, eps=1e-9):
    """[B, n, K, 3] gt x [B, L, K, 2] pred -> [B, n, L] mean OKS (ref :45-74)."""
    d = jnp.sum((gt_kpts[:, :, None, :, :2] - pred_kpts[:, None, :, :, :]) ** 2, axis=-1)  # [B,n,L,K]
    area = (gt_bboxes[..., 2] - gt_bboxes[..., 0]) * (gt_bboxes[..., 3] - gt_bboxes[..., 1])  # [B,n]
    e = d / (2 * sigmas.reshape(1, 1, 1, -1)) ** 2 / (area[:, :, None, None] + eps) / 2
    oks = jnp.exp(-e)
    vis = (gt_kpts[..., 2] > 0).astype(jnp.float32)[:, :, None, :]  # [B,n,1,K]
    nv = jnp.sum(vis, axis=-1)
    return jnp.sum(oks * vis, axis=-1) / (nv + eps)


class PoseTaskAlignedAssigner(TaskAlignedAssigner):
    """TAL for single-class pose; optionally multiplies IoU by pose OKS (ref :79-260)."""

    def __init__(self, sigmas, topk=13, alpha=1.0, beta=6.0, eps=1e-9, multiply_by_pose_oks=False):
        super().__init__(topk, alpha, beta, eps)
        self.sigmas = jnp.asarray(sigmas, dtype=jnp.float32)
        self.multiply_by_pose_oks = multiply_by_pose_oks

    def assign(self, pred_scores, pred_bboxes, pred_kpts, anchor_points, gt_bboxes, gt_kpts, pad_gt_mask):
        ious = batch_iou_similarity(gt_bboxes, pred_bboxes)
        if self.multiply_by_pose_oks:
            ious = ious * batch_pose_oks(gt_kpts, pred_kpts, gt_bboxes, self.sigmas)
        ious = ious * pad_gt_mask[..., None]

        # single class: per-gt score is just the objectness score
        bbox_cls_scores = jnp.broadcast_to(pred_scores[..., 0][:, None, :], ious.shape)
        alignment_metrics = (bbox_cls_scores**self.alpha) * (ious**self.beta)
        is_in_gts = check_points_inside_bboxes(anchor_points, gt_bboxes)
        is_in_topk = gather_topk_anchors(alignment_metrics * is_in_gts, self.topk, topk_mask=pad_gt_mask[..., None])
        mask_positive = is_in_topk * is_in_gts * pad_gt_mask[..., None]

        mask_positive_sum = jnp.sum(mask_positive, axis=-2)
        mask_multiple = mask_positive_sum[:, None, :] > 1
        is_max_iou = compute_max_iou_anchor(ious)
        mask_positive = jnp.where(mask_multiple, is_max_iou, mask_positive)

        gt_labels = jnp.zeros(gt_bboxes.shape[:2], dtype=jnp.int32)
        labels, bboxes, scores, mps, gt_index = _gather_assigned(mask_positive, gt_labels, gt_bboxes, 1)

        alignment_metrics = alignment_metrics * mask_positive
        max_m = jnp.max(alignment_metrics, axis=-1, keepdims=True)
        max_i = jnp.max(ious * mask_positive, axis=-1, keepdims=True)
        alignment_metrics = alignment_metrics / (max_m + self.eps) * max_i
        anchor_metric = jnp.max(alignment_metrics, axis=-2)[..., None]
        scores = scores * anchor_metric
        return AssignResult(labels, bboxes, scores, gt_index)


@register_loss("YoloNASPoseLoss")
class YoloNASPoseLoss:
    """ref yolo_nas_pose_loss.py:289-682."""

    component_names = ["loss_cls", "loss_iou", "loss_dfl", "loss_pose_cls", "loss_pose_reg", "loss"]

    def __init__(
        self,
        num_joints: int = 17,
        oks_sigmas: Sequence[float] = tuple(COCO_POSE_SIGMAS),
        classification_loss_weight: float = 1.0,
        iou_loss_weight: float = 2.5,
        dfl_loss_weight: float = 0.5,
        pose_cls_loss_weight: float = 1.0,
        pose_reg_loss_weight: float = 34.0,
        assigner_multiply_by_pose_oks: bool = True,
        rescale_pose_loss_with_assigned_score: bool = True,
        pose_classification_loss_type: str = "focal",
    ):
        self.num_joints = num_joints
        self.sigmas = jnp.asarray(oks_sigmas, dtype=jnp.float32)
        self.classification_loss_weight = classification_loss_weight
        self.iou_loss_weight = iou_loss_weight
        self.dfl_loss_weight = dfl_loss_weight
        self.pose_cls_loss_weight = pose_cls_loss_weight
        self.pose_reg_loss_weight = pose_reg_loss_weight
        self.rescale_pose_loss = rescale_pose_loss_with_assigned_score
        self.pose_cls_type = pose_classification_loss_type
        self.assigner = PoseTaskAlignedAssigner(
            self.sigmas, topk=13, alpha=1.0, beta=6.0, multiply_by_pose_oks=assigner_multiply_by_pose_oks
        )

    def __call__(self, outputs, targets: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        k = self.num_joints
        gt_valid = targets[..., 0] >= 0  # [B, n]
        gt_bboxes = targets[..., 1:5]
        gt_kpts = targets[..., 5 : 5 + 3 * k].reshape(*targets.shape[:2], k, 3)
        pad_gt_mask = gt_valid.astype(jnp.float32)

        cls_logits = outputs.cls_logits  # [B, A, 1]
        reg_distri = outputs.reg_distri
        pose_logits = outputs.pose_logits  # [B, A, K]
        points_s = outputs.anchor_points
        stride_t = outputs.stride_tensor
        b, num_anchors, _ = cls_logits.shape
        reg_max = reg_distri.shape[-1] // 4 - 1

        pred_dist_4 = reg_distri.reshape(b, num_anchors, 4, reg_max + 1)
        proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
        dist = jnp.einsum("blnk,k->bln", jax.nn.softmax(pred_dist_4.astype(jnp.float32), -1), proj)
        pred_bboxes_s = jnp.concatenate([points_s - dist[..., :2], points_s + dist[..., 2:]], -1)
        points_px = points_s * stride_t
        pred_bboxes_px = pred_bboxes_s * stride_t[None]
        pred_pose_px = outputs.pred_pose_coords  # [B, A, K, 2] already decoded px

        assign = self.assigner.assign(
            pred_scores=jax.lax.stop_gradient(jax.nn.sigmoid(cls_logits.astype(jnp.float32))),
            pred_bboxes=jax.lax.stop_gradient(pred_bboxes_px),
            pred_kpts=jax.lax.stop_gradient(pred_pose_px),
            anchor_points=points_px,
            gt_bboxes=gt_bboxes,
            gt_kpts=gt_kpts,
            pad_gt_mask=pad_gt_mask,
        )
        assign = AssignResult(*[jax.lax.stop_gradient(a) for a in assign])

        # classification (single class, focal as in reference default)
        cls_loss_sum = focal_loss(cls_logits.astype(jnp.float32)[..., 0], assign.scores[..., 0], alpha=-1.0)
        assigned_scores_sum = jnp.clip(jnp.sum(assign.scores), 1.0)

        mask_positive = (assign.labels != 1).astype(jnp.float32)  # bg_index == 1 (single class)
        bbox_weight = assign.scores[..., 0] * mask_positive

        assigned_bboxes_s = assign.bboxes / stride_t[None]
        iou_l = giou_loss(pred_bboxes_s, assigned_bboxes_s) * bbox_weight
        iou_loss_sum = jnp.sum(iou_l)

        assigned_ltrb = jnp.clip(
            jnp.concatenate([points_s - assigned_bboxes_s[..., :2], assigned_bboxes_s[..., 2:] - points_s], -1),
            0,
            reg_max - 0.01,
        )
        dfl = df_loss(pred_dist_4.astype(jnp.float32), assigned_ltrb) * bbox_weight
        dfl_loss_sum = jnp.sum(dfl)

        # ---- keypoints (masked over all anchors; weights zero at negatives) ----
        assigned_kpts = jnp.take_along_axis(gt_kpts, assign.gt_index[..., None, None], axis=1)  # [B, A, K, 3]
        area = (assign.bboxes[..., 2] - assign.bboxes[..., 0]) * (assign.bboxes[..., 3] - assign.bboxes[..., 1])
        vis = (assigned_kpts[..., 2] > 0).astype(jnp.float32)  # [B, A, K]

        d = jnp.sum((pred_pose_px - assigned_kpts[..., :2]) ** 2, axis=-1)  # [B, A, K]
        e = d / (2 * self.sigmas.reshape(1, 1, -1)) ** 2 / (area[..., None] + 1e-9) / 2
        reg_unreduced = 1.0 - jnp.exp(-e)
        reg_per_anchor = jnp.sum(reg_unreduced * vis, -1) / (jnp.sum(vis, -1) + 1e-9)  # [B, A]

        if self.pose_cls_type == "focal":
            p = jax.nn.sigmoid(pose_logits.astype(jnp.float32))
            w = jnp.abs(p - vis) ** 2.0
            alpha_t = 0.25 * vis + 0.75 * (1 - vis)
            pose_cls_per_anchor = jnp.mean(alpha_t * w * _bce_with_logits(pose_logits.astype(jnp.float32), vis), -1)
        else:
            pose_cls_per_anchor = jnp.mean(_bce_with_logits(pose_logits.astype(jnp.float32), vis), -1)

        if self.rescale_pose_loss:
            pose_w = bbox_weight
            denom = assigned_scores_sum
        else:
            pose_w = mask_positive
            denom = jnp.clip(jnp.sum(mask_positive), 1.0)
        pose_reg_sum = jnp.sum(reg_per_anchor * pose_w)
        pose_cls_sum = jnp.sum(pose_cls_per_anchor * pose_w)

        cls_loss = self.classification_loss_weight * cls_loss_sum / assigned_scores_sum
        iou_loss = self.iou_loss_weight * iou_loss_sum / assigned_scores_sum
        dfl_loss = self.dfl_loss_weight * dfl_loss_sum / assigned_scores_sum
        pose_cls_loss = self.pose_cls_loss_weight * pose_cls_sum / denom
        pose_reg_loss = self.pose_reg_loss_weight * pose_reg_sum / denom
        loss = cls_loss + iou_loss + dfl_loss + pose_cls_loss + pose_reg_loss
        return loss, {
            "loss_cls": cls_loss,
            "loss_iou": iou_loss,
            "loss_dfl": dfl_loss,
            "loss_pose_cls": pose_cls_loss,
            "loss_pose_reg": pose_reg_loss,
        }
