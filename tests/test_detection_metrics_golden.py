"""DetectionMetrics golden parity vs the REFERENCE matching + metric engine.

The reference's ``utils/detection_utils.py`` (compute_detection_matching :1120,
compute_detection_metrics :1361, IoUMatching :880) is loaded standalone via
ref_loader and run on randomized fixtures (multi-class, multi-image, crowd gts);
our numpy engine (metrics/detection.py match_predictions_to_gt + compute_ap +
best_score_thresholds) must agree to ~1e-6 on AP / precision / recall / F1 and
the best-score-threshold sweep. This converts the "COCO mAP within 0.1" north
star from hope into a checkable claim (VERDICT r2 item #3).
"""

import numpy as np
import pytest
import torch

import ref_loader

from super_gradients_tpu.training.metrics.detection import (
    best_score_thresholds,
    compute_ap,
    match_predictions_to_gt,
)

IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)
H = W = 320


def _du():
    return ref_loader.load_ref_module("super_gradients.training.utils.detection_utils")


def _make_fixture(rng, n_images, num_classes, max_preds=30, max_gts=8, crowd=False):
    """Random per-image predictions + flat normalized-cxcywh targets (ref format)."""
    preds_per_img, gt_rows, crowd_rows = [], [], []
    for i in range(n_images):
        n_p = rng.randint(0, max_preds + 1)
        xy = rng.rand(n_p, 2) * (W * 0.75)
        wh = rng.rand(n_p, 2) * (W * 0.25) + 4
        boxes = np.concatenate([xy, xy + wh], 1)
        conf = rng.rand(n_p)
        cls = rng.randint(0, num_classes, n_p)
        preds_per_img.append(np.concatenate([boxes, conf[:, None], cls[:, None]], 1).astype(np.float32))

        n_g = rng.randint(0, max_gts + 1)
        for _ in range(n_g):
            c = rng.randint(0, num_classes)
            # half the gts overlap some prediction so matching actually happens
            if n_p > 0 and rng.rand() < 0.6:
                base = boxes[rng.randint(n_p)]
                jitter = rng.randn(4) * 4
                bx = np.clip(base + jitter, 0, W)
            else:
                gxy = rng.rand(2) * (W * 0.75)
                gwh = rng.rand(2) * (W * 0.25) + 4
                bx = np.concatenate([gxy, gxy + gwh])
            cx, cy = (bx[0] + bx[2]) / 2 / W, (bx[1] + bx[3]) / 2 / H
            ww, hh = max(bx[2] - bx[0], 1) / W, max(bx[3] - bx[1], 1) / H
            gt_rows.append([i, c, cx, cy, ww, hh])
        if crowd:
            for _ in range(rng.randint(0, 3)):
                c = rng.randint(0, num_classes)
                gxy = rng.rand(2) * (W * 0.5)
                gwh = rng.rand(2) * (W * 0.45) + 20
                crowd_rows.append([i, c, (gxy[0] + gwh[0] / 2) / W, (gxy[1] + gwh[1] / 2) / H, gwh[0] / W, gwh[1] / H])
    gts = np.asarray(gt_rows, np.float32).reshape(-1, 6)
    crowds = np.asarray(crowd_rows, np.float32).reshape(-1, 6)
    return preds_per_img, gts, crowds


def _run_reference(preds_per_img, gts, crowds, score_threshold=0.1):
    du = _du()
    thr = torch.tensor(IOU_THRESHOLDS, dtype=torch.float32)
    matching = du.IoUMatching(thr)
    res = du.compute_detection_matching(
        output=[torch.from_numpy(p) for p in preds_per_img],
        targets=torch.from_numpy(gts),
        crowd_targets=torch.from_numpy(crowds) if len(crowds) else None,
        height=H, width=W, denormalize_targets=True, device="cpu",
        iou_thresholds=thr, top_k=100, matching_strategy=matching,
    )
    acc = [torch.cat(x, 0) for x in zip(*res)]
    ap, precision, recall, f1, uniq, best_thr, best_per_cls = du.compute_detection_metrics(
        *acc, recall_thresholds=None, score_threshold=score_threshold, device="cpu"
    )
    return (ap.numpy(), precision.numpy(), recall.numpy(), f1.numpy(), uniq.numpy(),
            float(best_thr), best_per_cls.numpy())


def _run_ours(preds_per_img, gts, crowds, num_classes, score_threshold=0.1):
    tps, keeps, confs, clss = [], [], [], []
    n_gt = np.zeros(num_classes, np.int64)
    for i, p in enumerate(preds_per_img):
        g = gts[gts[:, 0] == i]
        gb = np.stack([
            (g[:, 2] - g[:, 4] / 2) * W, (g[:, 3] - g[:, 5] / 2) * H,
            (g[:, 2] + g[:, 4] / 2) * W, (g[:, 3] + g[:, 5] / 2) * H,
        ], 1) if len(g) else np.zeros((0, 4), np.float32)
        gl = g[:, 1].astype(np.int64)
        cg = crowds[crowds[:, 0] == i] if len(crowds) else np.zeros((0, 6), np.float32)
        cb = np.stack([
            (cg[:, 2] - cg[:, 4] / 2) * W, (cg[:, 3] - cg[:, 5] / 2) * H,
            (cg[:, 2] + cg[:, 4] / 2) * W, (cg[:, 3] + cg[:, 5] / 2) * H,
        ], 1) if len(cg) else None
        cl = cg[:, 1].astype(np.int64) if len(cg) else None

        order = np.argsort(-p[:, 4], kind="stable")
        p = p[order]
        tp, keep = match_predictions_to_gt(p[:, :4], p[:, 5].astype(np.int64), gb, gl,
                                           IOU_THRESHOLDS, cb, cl)
        tps.append(tp), keeps.append(keep), confs.append(p[:, 4]), clss.append(p[:, 5].astype(np.int64))
        np.add.at(n_gt, gl, 1)
    tp = np.concatenate(tps) if tps else np.zeros((0, len(IOU_THRESHOLDS)), bool)
    keep = np.concatenate(keeps) if keeps else np.ones((0, len(IOU_THRESHOLDS)), bool)
    conf = np.concatenate(confs) if confs else np.zeros((0,))
    cls = np.concatenate(clss) if clss else np.zeros((0,), np.int64)
    ap, precision, recall, f1, has_gt = compute_ap(tp, conf, cls, n_gt, keep, score_threshold=score_threshold)
    best_thr, _, per_cls = best_score_thresholds(tp, conf, cls, n_gt, keep)
    return ap, precision, recall, f1, has_gt, best_thr, per_cls


@pytest.mark.parametrize("seed", range(12))
def test_metrics_engine_matches_reference(seed):
    rng = np.random.RandomState(seed)
    num_classes = rng.randint(2, 7)
    preds, gts, crowds = _make_fixture(rng, n_images=rng.randint(2, 6), num_classes=num_classes,
                                       crowd=bool(seed % 2))
    if len(gts) == 0:
        pytest.skip("fixture produced no gts")
    r_ap, r_p, r_r, r_f1, r_uniq, r_thr, r_thr_cls = _run_reference(preds, gts, crowds)
    ap, p, r, f1, has_gt, thr, per_cls = _run_ours(preds, gts, crowds, num_classes)

    ours_classes = np.nonzero(has_gt)[0]
    np.testing.assert_array_equal(ours_classes, r_uniq)
    np.testing.assert_allclose(ap[has_gt], r_ap, atol=1e-6, err_msg="AP")
    np.testing.assert_allclose(p[has_gt], r_p, atol=1e-6, err_msg="precision")
    np.testing.assert_allclose(r[has_gt], r_r, atol=1e-6, err_msg="recall")
    np.testing.assert_allclose(f1[has_gt], r_f1, atol=1e-6, err_msg="f1")
    assert abs(thr - r_thr) < 1e-6, f"best_score_threshold {thr} vs ref {r_thr}"
    ours_per_cls = np.asarray([per_cls[int(c)] for c in ours_classes])
    np.testing.assert_allclose(ours_per_cls, r_thr_cls, atol=1e-6, err_msg="per-class thresholds")


def test_metrics_engine_matches_reference_no_crowd_large():
    rng = np.random.RandomState(123)
    preds, gts, crowds = _make_fixture(rng, n_images=8, num_classes=10, max_preds=60, max_gts=15)
    r_ap, r_p, r_r, r_f1, r_uniq, r_thr, _ = _run_reference(preds, gts, crowds)
    ap, p, r, f1, has_gt, thr, _ = _run_ours(preds, gts, crowds, 10)
    np.testing.assert_allclose(ap[has_gt], r_ap, atol=1e-6)
    np.testing.assert_allclose(f1[has_gt], r_f1, atol=1e-6)
    assert abs(thr - r_thr) < 1e-6
