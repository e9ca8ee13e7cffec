"""Detection mAP metrics.

Reference parity: ``metrics/detection_metrics.py:28-468`` + the matching engine
``utils/detection_utils.py:813-1580`` (IoUMatching :880, compute_detection_matching
:1120, compute_detection_metrics :1361 with 101-point recall interpolation).

TPU split: NMS/decode runs on device via :meth:`preprocess_device` (fixed-shape
[B, max_pred, ...] outputs), greedy IoU matching + AP accumulation run on host
numpy — the reference's ``accumulate_on_cpu`` strategy, minus the per-image torch
loops (matching here is vectorized per image over [P, G] IoU matrices).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.registry import register_metric
from super_gradients_tpu.training.metrics.base import Metric


def _np_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def match_predictions_to_gt(
    pred_boxes: np.ndarray,  # [P, 4] xyxy, sorted by score desc
    pred_labels: np.ndarray,  # [P]
    gt_boxes: np.ndarray,  # [G, 4]
    gt_labels: np.ndarray,  # [G]
    iou_thresholds: np.ndarray,  # [T]
) -> np.ndarray:
    """Greedy per-threshold matching (higher-scored pred wins each gt).

    Returns tp: [P, T] bool. Same algorithm as the reference's IoUMatching
    (detection_utils.py:880+): candidate pairs (same class, IoU >= t) are ranked by
    IoU and greedily assigned so each gt and each pred match at most once.
    """
    p, g = len(pred_boxes), len(gt_boxes)
    t = len(iou_thresholds)
    tp = np.zeros((p, t), dtype=bool)
    if p == 0 or g == 0:
        return tp
    iou = _np_iou(pred_boxes, gt_boxes)
    same_cls = pred_labels[:, None] == gt_labels[None, :]
    iou = np.where(same_cls, iou, 0.0)
    for ti, thr in enumerate(iou_thresholds):
        cand_p, cand_g = np.nonzero(iou >= thr)
        if len(cand_p) == 0:
            continue
        order = np.argsort(-iou[cand_p, cand_g])
        used_p = np.zeros(p, bool)
        used_g = np.zeros(g, bool)
        for k in order:
            pi, gi = cand_p[k], cand_g[k]
            if not used_p[pi] and not used_g[gi]:
                used_p[pi] = used_g[gi] = True
                tp[pi, ti] = True
    return tp


def compute_ap(tp: np.ndarray, conf: np.ndarray, pred_cls: np.ndarray, n_gt_per_class: np.ndarray) -> Tuple:
    """Per-class AP with 101-point interpolation (ref compute_detection_metrics :1361).

    tp: [N, T]; conf: [N]; pred_cls: [N]; n_gt_per_class: [C].
    Returns (ap [C, T], precision [C, T], recall [C, T], f1 [C, T], classes_with_gt mask [C]).
    """
    num_classes = len(n_gt_per_class)
    t = tp.shape[1] if tp.ndim == 2 else 1
    ap = np.zeros((num_classes, t))
    precision = np.zeros((num_classes, t))
    recall = np.zeros((num_classes, t))

    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]
    recall_points = np.linspace(0, 1, 101)

    for c in range(num_classes):
        mask = pred_cls == c
        n_gt = n_gt_per_class[c]
        n_p = int(mask.sum())
        if n_p == 0 and n_gt == 0:
            continue
        if n_p == 0 or n_gt == 0:
            continue
        tpc = tp[mask].cumsum(axis=0)  # [n_p, T]
        fpc = (~tp[mask]).cumsum(axis=0)
        rec = tpc / (n_gt + 1e-16)
        prec = tpc / (tpc + fpc)
        precision[c] = prec[-1]
        recall[c] = rec[-1]
        for ti in range(t):
            # COCO 101-point AP: mean of the precision envelope sampled at the
            # first rank where recall >= r (0 where recall never reaches r)
            mrec = rec[:, ti]
            env = np.flip(np.maximum.accumulate(np.flip(prec[:, ti])))
            inds = np.searchsorted(mrec, recall_points, side="left")
            valid = inds < len(mrec)
            ap[c, ti] = env[inds[valid]].sum() / len(recall_points)
    f1 = 2 * precision * recall / (precision + recall + 1e-16)
    has_gt = n_gt_per_class > 0
    return ap, precision, recall, f1, has_gt


@register_metric("DetectionMetrics")
class DetectionMetrics(Metric):
    """mAP@[0.5:0.95] + P/R/F1@0.5 (ref DetectionMetrics, detection_metrics.py:28)."""

    host_update = True

    def __init__(
        self,
        num_cls: int = 80,
        iou_thresholds: Optional[Sequence[float]] = None,
        score_threshold: float = 0.01,
        nms_iou: float = 0.7,
        nms_top_k: int = 1024,
        max_predictions: int = 300,
        class_agnostic_nms: bool = False,
        multi_label_per_box: bool = True,
        nms_mode: str = "exact",
    ):
        self.num_cls = num_cls
        self.iou_thresholds = np.asarray(iou_thresholds if iou_thresholds is not None else np.linspace(0.5, 0.95, 10))
        self.score_threshold = score_threshold
        self.nms_iou = nms_iou
        self.nms_top_k = nms_top_k
        self.max_predictions = max_predictions
        self.class_agnostic_nms = class_agnostic_nms
        self.multi_label_per_box = multi_label_per_box
        self.nms_mode = nms_mode

    @property
    def _range_str(self) -> str:
        lo, hi = self.iou_thresholds[0], self.iou_thresholds[-1]
        return f"{lo:.2f}" if len(self.iou_thresholds) == 1 else f"{lo:.2f}:{hi:.2f}"

    def init(self):
        return {"tp": [], "conf": [], "cls": [], "n_gt": np.zeros(self.num_cls, dtype=np.int64)}

    def preprocess_device(self, outputs, targets):
        """Fused decode+NMS on device (jittable)."""
        from super_gradients_tpu.ops.nms import batched_nms

        return batched_nms(
            outputs.pred_bboxes,
            outputs.pred_scores,
            score_threshold=self.score_threshold,
            iou_threshold=self.nms_iou,
            nms_top_k=self.nms_top_k,
            max_predictions=self.max_predictions,
            multi_label=self.multi_label_per_box,
            class_agnostic=self.class_agnostic_nms,
            mode=self.nms_mode,
        )

    def update(self, state, nms_out, targets):
        """Host: greedy matching per image. targets: [B, max_boxes, 5] padded."""
        boxes = np.asarray(nms_out.boxes)
        scores = np.asarray(nms_out.scores)
        labels = np.asarray(nms_out.labels)
        nums = np.asarray(nms_out.num_detections)
        targets = np.asarray(targets)
        for i in range(boxes.shape[0]):
            n = int(nums[i])
            pb, ps, pl = boxes[i, :n], scores[i, :n], labels[i, :n]
            valid_gt = targets[i, :, 0] >= 0
            gb = targets[i, valid_gt, 1:5]
            gl = targets[i, valid_gt, 0].astype(np.int64)
            order = np.argsort(-ps)
            pb, ps, pl = pb[order], ps[order], pl[order]
            tp = match_predictions_to_gt(pb, pl, gb, gl, self.iou_thresholds)
            state["tp"].append(tp)
            state["conf"].append(ps)
            state["cls"].append(pl)
            np.add.at(state["n_gt"], gl, 1)
        return state

    def compute(self, state) -> Dict[str, float]:
        rs = self._range_str
        if not state["tp"]:
            return {f"mAP@{rs}": 0.0, f"Precision@{rs}": 0.0, f"Recall@{rs}": 0.0, f"F1@{rs}": 0.0}
        tp = np.concatenate(state["tp"]) if state["tp"] else np.zeros((0, len(self.iou_thresholds)), bool)
        conf = np.concatenate(state["conf"])
        cls = np.concatenate(state["cls"])
        ap, precision, recall, f1, has_gt = compute_ap(tp, conf, cls, state["n_gt"])
        if not has_gt.any():
            return {f"mAP@{rs}": 0.0, f"Precision@{rs}": 0.0, f"Recall@{rs}": 0.0, f"F1@{rs}": 0.0}
        out = {
            f"mAP@{rs}": float(ap[has_gt].mean()),
            f"Precision@{rs}": float(precision[has_gt, 0].mean()),
            f"Recall@{rs}": float(recall[has_gt, 0].mean()),
            f"F1@{rs}": float(f1[has_gt, 0].mean()),
        }
        if len(self.iou_thresholds) > 1:
            out[f"mAP@{self.iou_thresholds[0]:.2f}"] = float(ap[has_gt, 0].mean())
        return out


@register_metric("DetectionMetrics_050")
class DetectionMetrics_050(DetectionMetrics):
    def __init__(self, **kw):
        kw.pop("iou_thresholds", None)
        super().__init__(iou_thresholds=[0.5], **kw)


@register_metric("DetectionMetrics_075")
class DetectionMetrics_075(DetectionMetrics):
    def __init__(self, **kw):
        kw.pop("iou_thresholds", None)
        super().__init__(iou_thresholds=[0.75], **kw)


@register_metric("DetectionMetrics_050_095")
class DetectionMetrics_050_095(DetectionMetrics):
    pass
