import numpy as np
import pytest

from super_gradients_tpu.training.metrics.detection import (
    DetectionMetrics,
    DetectionMetrics_050,
    compute_ap,
    match_predictions_to_gt,
)


class _FakeNMS:
    def __init__(self, boxes, scores, labels, nums):
        self.boxes, self.scores, self.labels, self.num_detections = boxes, scores, labels, nums


def _targets(gt_per_image, max_boxes=10):
    b = len(gt_per_image)
    t = np.full((b, max_boxes, 5), -1.0, dtype=np.float32)
    for i, gts in enumerate(gt_per_image):
        for j, (c, box) in enumerate(gts):
            t[i, j, 0] = c
            t[i, j, 1:] = box
    return t


def test_matching_greedy_semantics():
    preds = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32)
    labels = np.asarray([0, 0, 1])
    gts = np.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    gl = np.asarray([0, 1])
    tp, _ = match_predictions_to_gt(preds, labels, gts, gl, np.asarray([0.5]))
    # pred0 takes gt0 (higher rank), pred1 can't re-match gt0, pred2 matches gt1
    assert tp[:, 0].tolist() == [True, False, True]
    # class mismatch kills the match
    tp2, _ = match_predictions_to_gt(preds, np.asarray([1, 1, 0]), gts, gl, np.asarray([0.5]))
    assert tp2[:, 0].tolist() == [False, False, False]


def test_perfect_predictions_give_map_1():
    m = DetectionMetrics_050(num_cls=3)
    state = m.init()
    gt = [[(0, [0, 0, 10, 10]), (1, [20, 20, 40, 40])], [(2, [5, 5, 15, 15])]]
    targets = _targets(gt)
    boxes = np.zeros((2, 5, 4), np.float32)
    scores = np.zeros((2, 5), np.float32)
    labels = np.full((2, 5), -1, np.int64)
    boxes[0, 0], scores[0, 0], labels[0, 0] = [0, 0, 10, 10], 0.9, 0
    boxes[0, 1], scores[0, 1], labels[0, 1] = [20, 20, 40, 40], 0.8, 1
    boxes[1, 0], scores[1, 0], labels[1, 0] = [5, 5, 15, 15], 0.95, 2
    nums = np.asarray([2, 1])
    state = m.update(state, _FakeNMS(boxes, scores, labels, nums), targets)
    res = m.compute(state)
    assert res["mAP@0.50"] == pytest.approx(1.0, abs=1e-3)
    assert res["Recall@0.50"] == pytest.approx(1.0, abs=1e-3)
    assert res["Precision@0.50"] == pytest.approx(1.0, abs=1e-3)


def test_false_positives_reduce_precision_and_map():
    m = DetectionMetrics_050(num_cls=2)
    state = m.init()
    targets = _targets([[(0, [0, 0, 10, 10])]])
    boxes = np.zeros((1, 5, 4), np.float32)
    scores = np.zeros((1, 5), np.float32)
    labels = np.full((1, 5), -1, np.int64)
    # one correct (lower conf), one FP (higher conf) -> AP ~0.5
    boxes[0, 0], scores[0, 0], labels[0, 0] = [100, 100, 120, 120], 0.9, 0
    boxes[0, 1], scores[0, 1], labels[0, 1] = [0, 0, 10, 10], 0.8, 0
    state = m.update(state, _FakeNMS(boxes, scores, labels, np.asarray([2])), targets)
    res = m.compute(state)
    assert 0.3 < res["mAP@0.50"] < 0.7
    assert res["Recall@0.50"] == pytest.approx(1.0, abs=1e-3)
    assert res["Precision@0.50"] == pytest.approx(0.5, abs=1e-3)


def test_map_range_lower_than_50():
    """A slightly-offset box passes IoU 0.5 but fails 0.95 → mAP@range < mAP@0.5."""
    m = DetectionMetrics(num_cls=1)
    state = m.init()
    targets = _targets([[(0, [0, 0, 20, 20])]])
    boxes = np.zeros((1, 3, 4), np.float32)
    scores = np.zeros((1, 3), np.float32)
    labels = np.full((1, 3), -1, np.int64)
    boxes[0, 0], scores[0, 0], labels[0, 0] = [2, 2, 22, 22], 0.9, 0
    state = m.update(state, _FakeNMS(boxes, scores, labels, np.asarray([1])), targets)
    res = m.compute(state)
    assert res["mAP@0.50"] == pytest.approx(1.0, abs=1e-3)
    assert res["mAP@0.50:0.95"] < 0.7


def test_end_to_end_with_model_outputs():
    """DetectionMetrics consumes model outputs through the device preprocess path."""
    import jax.numpy as jnp

    from super_gradients_tpu import models

    model = models.get("yolo_nas_s", num_classes=4, image_size=64)
    out = model.module.apply(model.variables, jnp.zeros((2, 64, 64, 3)), train=False)
    m = DetectionMetrics(num_cls=4, nms_top_k=64, max_predictions=10, nms_mode="fast")
    nms_out = m.preprocess_device(out, None)
    state = m.init()
    targets = _targets([[(0, [0, 0, 30, 30])], [(1, [10, 10, 50, 50])]])
    state = m.update(state, nms_out, targets)
    res = m.compute(state)
    assert "mAP@0.50:0.95" in res and np.isfinite(res["mAP@0.50:0.95"])


def test_crowd_gt_excludes_unmatched_overlapping_preds():
    """Unmatched preds overlapping a same-class crowd gt (IoA > t) are neither TP
    nor FP (ref detection_utils.py:797 crowd_ioa / pycocotools iscrowd)."""
    m = DetectionMetrics_050(num_cls=2, calc_best_score_thresholds=False)
    state = m.init()
    # one regular gt (cls 0) + one crowd region (cls 0)
    targets = np.full((1, 4, 6), -1.0, np.float32)
    targets[0, 0] = [0, 0, 0, 10, 10, 0]       # regular gt
    targets[0, 1] = [0, 50, 50, 100, 100, 1]   # crowd gt
    # preds: one matching the gt, one inside the crowd region, one true FP
    boxes = np.zeros((1, 5, 4), np.float32)
    boxes[0, 0] = [0, 0, 10, 10]
    boxes[0, 1] = [60, 60, 80, 80]   # inside crowd → excluded
    boxes[0, 2] = [200, 200, 220, 220]  # plain FP
    scores = np.zeros((1, 5), np.float32); scores[0, :3] = [0.9, 0.8, 0.7]
    labels = np.full((1, 5), -1, np.int32); labels[0, :3] = 0

    from super_gradients_tpu.ops.nms import NMSOutput
    out = NMSOutput(boxes=boxes, scores=scores, labels=labels, num_detections=np.asarray([3]))
    state = m.update(state, out, targets)
    res = m.compute(state)
    # with the crowd pred excluded: 1 TP, 1 FP → precision 0.5; without crowd
    # handling it would be 1/3
    assert abs(res["Precision@0.50"] - 0.5) < 1e-6
    # crowd gt must NOT count toward recall denominator
    assert abs(res["Recall@0.50"] - 1.0) < 1e-6


def test_classwise_ap_and_best_score_threshold():
    m = DetectionMetrics_050(num_cls=3, include_classwise_ap=True, class_names=["cat", "dog", "bird"])
    state = m.init()
    targets = np.full((1, 4, 5), -1.0, np.float32)
    targets[0, 0] = [0, 0, 0, 10, 10]
    targets[0, 1] = [1, 20, 20, 40, 40]
    boxes = np.zeros((1, 5, 4), np.float32)
    boxes[0, 0] = [0, 0, 10, 10]
    boxes[0, 1] = [20, 20, 40, 40]
    scores = np.zeros((1, 5), np.float32); scores[0, :2] = [0.9, 0.8]
    labels = np.full((1, 5), -1, np.int32); labels[0, :2] = [0, 1]
    from super_gradients_tpu.ops.nms import NMSOutput
    out = NMSOutput(boxes=boxes, scores=scores, labels=labels, num_detections=np.asarray([2]))
    state = m.update(state, out, targets)
    res = m.compute(state)
    assert abs(res["AP@0.50_cat"] - 1.0) < 1e-2
    assert abs(res["AP@0.50_dog"] - 1.0) < 1e-2
    assert "AP@0.50_bird" not in res  # no gt for bird
    assert 0.0 <= res["Best_score_threshold"] <= 0.9


def test_distance_based_metrics():
    from super_gradients_tpu.training.metrics.detection import DetectionMetricsDistanceBased

    m = DetectionMetricsDistanceBased(num_cls=2, distance_thresholds=[10.0], calc_best_score_thresholds=False)
    state = m.init()
    targets = np.full((1, 2, 5), -1.0, np.float32)
    targets[0, 0] = [0, 0, 0, 10, 10]  # center (5,5)
    boxes = np.zeros((1, 3, 4), np.float32)
    boxes[0, 0] = [2, 2, 14, 14]   # center (8,8) → dist ~4.2 < 10 → TP
    boxes[0, 1] = [100, 100, 120, 120]  # far → FP
    scores = np.zeros((1, 3), np.float32); scores[0, :2] = [0.9, 0.8]
    labels = np.full((1, 3), -1, np.int32); labels[0, :2] = 0
    from super_gradients_tpu.ops.nms import NMSOutput
    out = NMSOutput(boxes=boxes, scores=scores, labels=labels, num_detections=np.asarray([2]))
    state = m.update(state, out, targets)
    res = m.compute(state)
    assert res["Recall@dist10"] == 1.0
    assert res["Precision@dist10"] == 0.5


def test_all_gather_variable_length_single_process():
    from super_gradients_tpu.parallel.collectives import all_gather_variable_length

    arrays = {"a": np.arange(5), "b": np.ones((5, 2))}
    out = all_gather_variable_length(arrays)
    np.testing.assert_array_equal(out["a"], arrays["a"])
    np.testing.assert_array_equal(out["b"], arrays["b"])


def test_evaluate_end_to_end_with_crowd_targets(tmp_path):
    """Full eval loop over [B, max_boxes, 6] crowd-aware targets: loss masks crowd
    rows, metric applies crowd-IoA — the coco2017_val default contract."""
    import numpy as np

    from super_gradients_tpu import models
    from super_gradients_tpu.training.dataloaders import DataLoader
    from super_gradients_tpu.training.trainer import Trainer

    class _CrowdDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            rng = np.random.RandomState(i)
            img = rng.rand(64, 64, 3).astype(np.float32)
            t = np.full((6, 6), -1.0, np.float32)
            t[0] = [1, 4, 4, 30, 30, 0]    # regular gt
            t[1] = [1, 10, 10, 60, 60, 1]  # crowd region
            t[:, 5] = np.maximum(t[:, 5], 0)
            return img, t

    model = models.get("yolo_nas_s", num_classes=4, image_size=64)
    tr = Trainer("crowd_eval", ckpt_root_dir=str(tmp_path))
    res = tr.evaluate(
        model,
        DataLoader(_CrowdDS(), batch_size=4, drop_last=False),
        {"loss": "PPYoloELoss", "criterion_params": {"num_classes": 4}},
        metrics_list=[{"DetectionMetrics_050": {"num_cls": 4, "score_threshold": 0.0}}],
    )
    assert np.isfinite(res["Loss"])
    assert "mAP@0.50" in res
