"""PPYoloELoss + TAL/ATSS assigners — fully batched, padded-and-masked, jit-pure.

Reference: ``training/losses/ppyolo_loss.py`` — ATSSAssigner (:258),
TaskAlignedAssigner (:437), GIoULoss (:564), PPYoloELoss (:642, defaults
cls=1.0/iou=2.5/dfl=0.5, varifocal). Used by YOLO-NAS and PP-YOLOE training.

TPU redesign (SURVEY §7 "Ragged targets"): targets arrive PADDED as
``[B, max_boxes, 5]`` (cls, x1, y1, x2, y2; cls = -1 marks padding) instead of the
reference's ragged flat ``[N, 6]`` + per-image Python loops. All data-dependent
branches (``if mask_positive_sum.max() > 1`` etc.) become unconditional ``where``s —
the tensor math is identical on real boxes and no-ops on padding, so one XLA program
covers every batch. Top-k selection is ``lax.top_k`` + one-hot matmuls (MXU-friendly,
no scatter).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_loss
from super_gradients_tpu.ops.bbox import box_iou


# ------------------------------------------------------------------ support ops


def batch_iou_similarity(gt_bboxes: jnp.ndarray, pred_bboxes: jnp.ndarray) -> jnp.ndarray:
    """[B, n, 4] x [B, L, 4] -> [B, n, L] IoU."""
    return box_iou(gt_bboxes, pred_bboxes)


def check_points_inside_bboxes(points: jnp.ndarray, bboxes: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """points [L, 2], bboxes [B, n, 4] -> [B, n, L] float 0/1 (ref :178)."""
    x, y = points[:, 0], points[:, 1]  # [L]
    xmin, ymin, xmax, ymax = jnp.split(bboxes[..., None, :], 4, axis=-1)  # each [B, n, 1, 1]
    xmin, ymin, xmax, ymax = xmin[..., 0], ymin[..., 0], xmax[..., 0], ymax[..., 0]  # [B, n, 1]
    deltas = jnp.stack([x - xmin, y - ymin, xmax - x, ymax - y], axis=-1)  # [B, n, L, 4]
    return (jnp.min(deltas, axis=-1) > eps).astype(bboxes.dtype)


def _topk_mask_by_iterative_argmax(vals: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """0/1 mask of each row's k largest entries + the row max, via k argmax-extract
    passes instead of ``lax.top_k``.

    Selection is identical to ``top_k`` + one-hot-sum (ties resolve to the lowest
    index in both: XLA's top_k sort is stable, and ``argmax`` returns the first
    max), but costs k cheap vector passes over [B, n, L] instead of a bitonic
    sort of L — the sort dominated the train-step loss block on v5e
    (the TAL assigner calls this on [B, max_boxes, 8400]).
    """
    work = vals
    mask = jnp.zeros_like(vals)
    row_max = jnp.max(vals, axis=-1, keepdims=True)
    neg_inf = jnp.asarray(-jnp.inf, vals.dtype)
    for _ in range(k):
        idx = jnp.argmax(work, axis=-1)  # first max index per row
        sel = jax.nn.one_hot(idx, vals.shape[-1], dtype=vals.dtype)
        mask = mask + sel
        work = jnp.where(sel > 0, neg_inf, work)
    return mask, row_max


def gather_topk_anchors(
    metrics: jnp.ndarray, topk: int, topk_mask: Optional[jnp.ndarray] = None, largest: bool = True, eps: float = 1e-9
) -> jnp.ndarray:
    """metrics [B, n, L] -> 0/1 [B, n, L] marking per-gt top-k anchors (ref :214)."""
    num_anchors = metrics.shape[-1]
    k = min(topk, num_anchors)
    vals = metrics if largest else -metrics
    is_in_topk, row_max = _topk_mask_by_iterative_argmax(vals, k)
    if topk_mask is None:
        best = row_max if largest else -row_max
        topk_mask = (best > eps).astype(metrics.dtype)
    return is_in_topk * topk_mask


def compute_max_iou_anchor(ious: jnp.ndarray) -> jnp.ndarray:
    """For each anchor, one-hot over gts of the max-IoU gt: [B, n, L] (ref :233)."""
    num_max_boxes = ious.shape[-2]
    max_idx = jnp.argmax(ious, axis=-2)  # [B, L]
    return jnp.moveaxis(jax.nn.one_hot(max_idx, num_max_boxes, dtype=ious.dtype), -1, -2)


def _gather_assigned(
    mask_positive: jnp.ndarray,  # [B, n, L]
    gt_labels: jnp.ndarray,  # [B, n]
    gt_bboxes: jnp.ndarray,  # [B, n, 4]
    num_classes: int,
):
    """Shared tail of both assigners: pick gt per anchor, build labels/bboxes/one-hot."""
    mask_positive_sum = jnp.sum(mask_positive, axis=-2)  # [B, L]
    assigned_gt_index = jnp.argmax(mask_positive, axis=-2)  # [B, L]
    assigned_labels = jnp.take_along_axis(gt_labels, assigned_gt_index, axis=1)  # [B, L]
    assigned_labels = jnp.where(mask_positive_sum > 0, assigned_labels, num_classes)
    assigned_bboxes = jnp.take_along_axis(gt_bboxes, assigned_gt_index[..., None], axis=1)  # [B, L, 4]
    # one-hot over classes; bg (== num_classes) row dropped
    assigned_scores = jax.nn.one_hot(assigned_labels, num_classes + 1)[..., :num_classes]
    return assigned_labels, assigned_bboxes, assigned_scores, mask_positive_sum, assigned_gt_index


class AssignResult(NamedTuple):
    labels: jnp.ndarray  # [B, L] int32 (num_classes = background)
    bboxes: jnp.ndarray  # [B, L, 4]
    scores: jnp.ndarray  # [B, L, C]
    gt_index: jnp.ndarray = None  # [B, L] int32 index into gt arrays (valid where fg)


class TaskAlignedAssigner:
    """TOOD task-aligned assignment (ref ppyolo_loss.py:437-560), batched & masked."""

    def __init__(self, topk: int = 13, alpha: float = 1.0, beta: float = 6.0, eps: float = 1e-9):
        self.topk, self.alpha, self.beta, self.eps = topk, alpha, beta, eps

    def __call__(
        self,
        pred_scores: jnp.ndarray,  # [B, L, C] sigmoid scores (detached)
        pred_bboxes: jnp.ndarray,  # [B, L, 4] pixel units (detached)
        anchor_points: jnp.ndarray,  # [L, 2] pixel units
        gt_labels: jnp.ndarray,  # [B, n] int32 (pad = anything; masked)
        gt_bboxes: jnp.ndarray,  # [B, n, 4]
        pad_gt_mask: jnp.ndarray,  # [B, n] 1 = real box
        num_classes: int,
    ) -> AssignResult:
        ious = batch_iou_similarity(gt_bboxes, pred_bboxes)  # [B, n, L]
        ious = ious * pad_gt_mask[..., None]

        # per-gt class score of each anchor: one-hot matmul instead of fancy gather
        gt_onehot = jax.nn.one_hot(gt_labels, num_classes, dtype=pred_scores.dtype)  # [B, n, C]
        bbox_cls_scores = jnp.einsum("bnc,blc->bnl", gt_onehot, pred_scores)

        alignment_metrics = (bbox_cls_scores**self.alpha) * (ious**self.beta)
        is_in_gts = check_points_inside_bboxes(anchor_points, gt_bboxes)
        is_in_topk = gather_topk_anchors(alignment_metrics * is_in_gts, self.topk, topk_mask=pad_gt_mask[..., None])
        mask_positive = is_in_topk * is_in_gts * pad_gt_mask[..., None]

        # resolve anchors matched to multiple gts by max IoU (unconditional where)
        mask_positive_sum = jnp.sum(mask_positive, axis=-2)
        mask_multiple = (mask_positive_sum[:, None, :] > 1)
        is_max_iou = compute_max_iou_anchor(ious)
        mask_positive = jnp.where(mask_multiple, is_max_iou, mask_positive)

        assigned_labels, assigned_bboxes, assigned_scores, mps, assigned_gt_index = _gather_assigned(
            mask_positive, gt_labels, gt_bboxes, num_classes
        )

        # rescale one-hot scores by normalized alignment metric (ref :553-560)
        alignment_metrics = alignment_metrics * mask_positive
        max_metrics_per_instance = jnp.max(alignment_metrics, axis=-1, keepdims=True)
        max_ious_per_instance = jnp.max(ious * mask_positive, axis=-1, keepdims=True)
        alignment_metrics = alignment_metrics / (max_metrics_per_instance + self.eps) * max_ious_per_instance
        anchor_metric = jnp.max(alignment_metrics, axis=-2)[..., None]  # [B, L, 1]
        assigned_scores = assigned_scores * anchor_metric
        return AssignResult(assigned_labels, assigned_bboxes, assigned_scores, assigned_gt_index)


class ATSSAssigner:
    """Adaptive Training Sample Selection (ref ppyolo_loss.py:258-434), batched."""

    def __init__(self, topk: int = 9, eps: float = 1e-9):
        self.topk, self.eps = topk, eps

    def __call__(
        self,
        anchor_bboxes: jnp.ndarray,  # [L, 4] grid-cell boxes, pixel units
        num_anchors_list: Sequence[int],
        gt_labels: jnp.ndarray,  # [B, n]
        gt_bboxes: jnp.ndarray,  # [B, n, 4]
        pad_gt_mask: jnp.ndarray,  # [B, n]
        num_classes: int,
        pred_bboxes: Optional[jnp.ndarray] = None,  # [B, L, 4] for iou-based scores
    ) -> AssignResult:
        num_anchors = anchor_bboxes.shape[0]
        b, n = gt_labels.shape

        ious = batch_iou_similarity(gt_bboxes, anchor_bboxes[None].repeat(b, 0)) * pad_gt_mask[..., None]

        gt_centers = jnp.stack(
            [(gt_bboxes[..., 0] + gt_bboxes[..., 2]) * 0.5, (gt_bboxes[..., 1] + gt_bboxes[..., 3]) * 0.5], -1
        )  # [B, n, 2]
        anchor_centers = jnp.stack(
            [(anchor_bboxes[:, 0] + anchor_bboxes[:, 2]) * 0.5, (anchor_bboxes[:, 1] + anchor_bboxes[:, 3]) * 0.5], -1
        )  # [L, 2]
        dist = jnp.linalg.norm(gt_centers[:, :, None, :] - anchor_centers[None, None, :, :], axis=-1)  # [B, n, L]

        # per-pyramid-level top-k closest anchors (static level split)
        is_in_topk_list, topk_onehot_list = [], []
        start = 0
        for la in num_anchors_list:
            d = dist[..., start : start + la]
            k = min(self.topk, la)
            _, idxs = jax.lax.top_k(-d, k)  # smallest distances
            level_onehot = jax.nn.one_hot(idxs, la, dtype=ious.dtype)  # [B, n, k, la]
            in_topk = jnp.sum(level_onehot, axis=-2) * pad_gt_mask[..., None]
            is_in_topk_list.append(in_topk)
            # candidate selector (for threshold stats): pad to full-anchor one-hot
            full = jnp.zeros((b, n, k, num_anchors), dtype=ious.dtype)
            full = full.at[..., start : start + la].set(level_onehot)
            topk_onehot_list.append(full)
            start += la
        is_in_topk = jnp.concatenate(is_in_topk_list, axis=-1)  # [B, n, L]
        cand_sel = jnp.concatenate(topk_onehot_list, axis=-2)  # [B, n, K_total, L]

        # candidate ious -> mean+std threshold (torch std: ddof=1)
        iou_candidates = ious * is_in_topk
        cand_ious = jnp.einsum("bnkl,bnl->bnk", cand_sel, iou_candidates)
        thr = jnp.mean(cand_ious, axis=-1, keepdims=True) + jnp.std(cand_ious, axis=-1, keepdims=True, ddof=1)
        is_in_topk = jnp.where(iou_candidates > thr, is_in_topk, 0.0)

        is_in_gts = check_points_inside_bboxes(anchor_centers, gt_bboxes)
        mask_positive = is_in_topk * is_in_gts * pad_gt_mask[..., None]

        mask_positive_sum = jnp.sum(mask_positive, axis=-2)
        mask_multiple = mask_positive_sum[:, None, :] > 1
        is_max_iou = compute_max_iou_anchor(ious)
        mask_positive = jnp.where(mask_multiple, is_max_iou, mask_positive)

        assigned_labels, assigned_bboxes, assigned_scores, mps, assigned_gt_index = _gather_assigned(
            mask_positive, gt_labels, gt_bboxes, num_classes
        )
        if pred_bboxes is not None:
            pious = batch_iou_similarity(gt_bboxes, pred_bboxes) * mask_positive
            assigned_scores = assigned_scores * jnp.max(pious, axis=-2)[..., None]
        return AssignResult(assigned_labels, assigned_bboxes, assigned_scores, assigned_gt_index)


# --------------------------------------------------------------------- losses


def giou_loss(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """1 - GIoU, elementwise over [..., 4] (ref GIoULoss :564-640)."""
    x1, y1, x2, y2 = jnp.split(pred, 4, -1)
    x1g, y1g, x2g, y2g = jnp.split(target, 4, -1)
    xk1, yk1 = jnp.maximum(x1, x1g), jnp.maximum(y1, y1g)
    xk2, yk2 = jnp.minimum(x2, x2g), jnp.minimum(y2, y2g)
    overlap = jnp.clip(xk2 - xk1, 0) * jnp.clip(yk2 - yk1, 0)
    area1 = (x2 - x1) * (y2 - y1)
    area2 = (x2g - x1g) * (y2g - y1g)
    union = area1 + area2 - overlap + eps
    iou = overlap / union
    xc1, yc1 = jnp.minimum(x1, x1g), jnp.minimum(y1, y1g)
    xc2, yc2 = jnp.maximum(x2, x2g), jnp.maximum(y2, y2g)
    area_c = (xc2 - xc1) * (yc2 - yc1) + eps
    miou = iou - (area_c - union) / area_c
    return (1.0 - miou)[..., 0]


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def varifocal_loss(pred_logits, gt_score, label, alpha: float = 0.75, gamma: float = 2.0) -> jnp.ndarray:
    """ref :1078-1084 (sum reduction)."""
    pred_score = jax.nn.sigmoid(pred_logits)
    weight = alpha * (pred_score**gamma) * (1 - label) + gt_score * label
    return jnp.sum(weight * _bce_with_logits(pred_logits, gt_score))


def focal_loss(pred_logits, label, alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """ref :1069-1076 (sum reduction)."""
    pred_score = jax.nn.sigmoid(pred_logits)
    weight = jnp.abs(pred_score - label) ** gamma
    if alpha > 0:
        weight = weight * (alpha * label + (1 - alpha) * (1 - label))
    return jnp.sum(weight * _bce_with_logits(pred_logits, label))


def df_loss(pred_dist: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Distribution focal loss, two-hot CE (ref _df_loss :998-1006).

    pred_dist: [..., 4, reg_max+1] logits; target: [..., 4] continuous in [0, reg_max).
    Returns [...] mean over the 4 sides.
    """
    target_left = jnp.floor(target).astype(jnp.int32)
    target_right = target_left + 1
    weight_left = target_right.astype(target.dtype) - target
    weight_right = 1.0 - weight_left
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    nbins = pred_dist.shape[-1]
    loss_left = -jnp.sum(jax.nn.one_hot(target_left, nbins) * logp, -1) * weight_left
    loss_right = -jnp.sum(jax.nn.one_hot(jnp.clip(target_right, 0, nbins - 1), nbins) * logp, -1) * weight_right
    return jnp.mean(loss_left + loss_right, axis=-1)


# ----------------------------------------------------------------- main loss


@register_loss("PPYoloELoss")
class PPYoloELoss:
    """ref PPYoloELoss (:642): varifocal/focal cls + GIoU + DFL, normalized by the
    (clipped) sum of assigned scores. component_names: loss_cls/loss_iou/loss_dfl/loss.

    Call signature: ``loss(outputs: YoloNASOutputs, targets [B, max_boxes, 5])`` where
    targets rows are (cls, x1, y1, x2, y2) with cls == -1 padding.
    """

    component_names = ["PPYoloELoss/loss_cls", "PPYoloELoss/loss_iou", "PPYoloELoss/loss_dfl", "PPYoloELoss/loss"]

    def __init__(
        self,
        num_classes: int,
        use_varifocal_loss: bool = True,
        use_static_assigner: bool = False,
        classification_loss_weight: float = 1.0,
        iou_loss_weight: float = 2.5,
        dfl_loss_weight: float = 0.5,
        grid_cell_scale: float = 5.0,
    ):
        self.num_classes = num_classes
        self.use_varifocal_loss = use_varifocal_loss
        self.use_static_assigner = use_static_assigner
        self.classification_loss_weight = classification_loss_weight
        self.iou_loss_weight = iou_loss_weight
        self.dfl_loss_weight = dfl_loss_weight
        self.grid_cell_scale = grid_cell_scale
        self.assigner = TaskAlignedAssigner(topk=13, alpha=1.0, beta=6.0)
        self.static_assigner = ATSSAssigner(topk=9)

    def __call__(self, outputs, targets: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        # unpack model outputs (YoloNASOutputs or equivalent namedtuple)
        cls_logits = outputs.cls_logits  # [B, L, C]
        reg_distri = outputs.reg_distri  # [B, L, 4*(reg_max+1)]
        points_s = outputs.anchor_points  # [L, 2] stride units
        stride_t = outputs.stride_tensor  # [L, 1]
        num_anchors_list = outputs.num_anchors_list

        b, num_total_anchors, _ = cls_logits.shape
        reg_max = reg_distri.shape[-1] // 4 - 1

        gt_labels = jnp.maximum(targets[..., 0], 0).astype(jnp.int32)  # [B, n]
        gt_bboxes = targets[..., 1:5]
        pad_gt_mask = (targets[..., 0] >= 0).astype(cls_logits.dtype)  # [B, n]
        if targets.shape[-1] >= 6:
            # crowd-aware targets ([..., 5] = is_crowd): crowd regions are excluded
            # from assignment/loss (ref: crowd gts feed only metric IoA handling)
            pad_gt_mask = pad_gt_mask * (targets[..., 5] <= 0).astype(cls_logits.dtype)

        # decode pred boxes in stride units (gradient flows through for IoU loss)
        pred_dist_4 = reg_distri.reshape(b, num_total_anchors, 4, reg_max + 1)
        proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
        dist = jnp.einsum("blnk,k->bln", jax.nn.softmax(pred_dist_4.astype(jnp.float32), -1), proj)
        pred_bboxes_s = jnp.concatenate([points_s - dist[..., :2], points_s + dist[..., 2:]], -1)  # [B, L, 4]

        points_px = points_s * stride_t  # pixel units
        pred_bboxes_px = pred_bboxes_s * stride_t[None]

        if self.use_static_assigner:
            # grid-cell anchor boxes (ref generate_anchors_for_grid_cell)
            half = self.grid_cell_scale * stride_t[:, 0] * 0.5
            anchor_bboxes = jnp.concatenate(
                [points_px - jnp.stack([half, half], -1), points_px + jnp.stack([half, half], -1)], -1
            )
            assign = self.static_assigner(
                anchor_bboxes=anchor_bboxes,
                num_anchors_list=num_anchors_list,
                gt_labels=gt_labels,
                gt_bboxes=gt_bboxes,
                pad_gt_mask=pad_gt_mask,
                num_classes=self.num_classes,
                pred_bboxes=jax.lax.stop_gradient(pred_bboxes_px),
            )
            alpha_l = 0.25
        else:
            assign = self.assigner(
                pred_scores=jax.lax.stop_gradient(jax.nn.sigmoid(cls_logits.astype(jnp.float32))),
                pred_bboxes=jax.lax.stop_gradient(pred_bboxes_px),
                anchor_points=points_px,
                gt_labels=gt_labels,
                gt_bboxes=gt_bboxes,
                pad_gt_mask=pad_gt_mask,
                num_classes=self.num_classes,
            )
            alpha_l = -1.0
        assign = AssignResult(*[jax.lax.stop_gradient(a) for a in assign])

        # classification
        if self.use_varifocal_loss:
            one_hot_label = jax.nn.one_hot(assign.labels, self.num_classes + 1)[..., :-1]
            cls_loss_sum = varifocal_loss(cls_logits.astype(jnp.float32), assign.scores, one_hot_label)
        else:
            cls_loss_sum = focal_loss(cls_logits.astype(jnp.float32), assign.scores, alpha_l)

        assigned_scores_sum = jnp.clip(jnp.sum(assign.scores), 1.0)

        # bbox losses on positives (masked, not gathered — static shapes)
        mask_positive = (assign.labels != self.num_classes).astype(jnp.float32)  # [B, L]
        bbox_weight = jnp.sum(assign.scores, -1) * mask_positive  # [B, L]
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

        cls_loss = self.classification_loss_weight * cls_loss_sum / assigned_scores_sum
        iou_loss = self.iou_loss_weight * iou_loss_sum / assigned_scores_sum
        dfl_loss = self.dfl_loss_weight * dfl_loss_sum / assigned_scores_sum
        loss = cls_loss + iou_loss + dfl_loss
        return loss, {
            "loss_cls": cls_loss,
            "loss_iou": iou_loss,
            "loss_dfl": dfl_loss,
        }
