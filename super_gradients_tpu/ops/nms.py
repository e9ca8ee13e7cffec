"""Batched, class-aware, fixed-shape NMS — the TPU replacement for
``torchvision.ops.batched_nms`` (reference ``utils/detection_utils.py:329``,
``pp_yolo_e/post_prediction_callback.py:85``).

Design (SURVEY §7 "NMS on TPU"): everything is static-shape and batched —
``[B, N, C]`` score maps go through top-k prefilter → class-offset trick →
suppression → fixed ``max_predictions`` outputs with a validity count. Three
suppression modes:

- ``exact``  — sequential greedy NMS (torchvision-equivalent) via ``lax.fori_loop``;
  bit-parity for mAP evaluation.
- ``fast``   — YOLACT-style parallel NMS: one triangular-max matrix op; a box is
  suppressed if ANY higher-scored box overlaps it (no reactivation). ~0.1 mAP lower,
  wholly parallel → default for latency-critical ``predict``.
- ``matrix`` — Matrix-NMS (SoloV2) score decay; fully parallel, differentiable-ish.
- ``pallas`` — exact-NMS semantics via the blocked Pallas VMEM kernel
  (``ops/pallas/nms_kernel.py``); candidate for large-K suppression on TPU.

No per-image Python loop anywhere: batching via ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from super_gradients_tpu.ops.bbox import box_iou

_CLASS_OFFSET = 8192.0  # > any image dimension we support; separates classes spatially


class NMSOutput(NamedTuple):
    """Fixed-shape detection output (analogue of the reference's BATCHED format
    ``[B, max_predictions, 6]``, ``conversion/onnx/nms.py``)."""

    boxes: jnp.ndarray  # [B, max_predictions, 4] xyxy
    scores: jnp.ndarray  # [B, max_predictions]
    labels: jnp.ndarray  # [B, max_predictions] int32
    num_detections: jnp.ndarray  # [B] int32


def _exact_keep_mask(iou: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Greedy sequential NMS on score-sorted boxes. iou: [K,K], valid: [K] bool."""
    k = iou.shape[0]
    over = (iou > iou_threshold) & valid[None, :] & valid[:, None]
    idx = jnp.arange(k)

    def body(i, keep):
        # suppressed iff any kept j < i overlaps i
        row = over[i]
        suppressed = jnp.any(row & keep & (idx < i))
        return keep.at[i].set(valid[i] & ~suppressed)

    keep0 = jnp.zeros((k,), dtype=bool).at[0].set(valid[0])
    return jax.lax.fori_loop(1, k, body, keep0)


def _fast_keep_mask(iou: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """YOLACT fast-NMS: keep i unless some higher-ranked j overlaps it."""
    k = iou.shape[0]
    idx = jnp.arange(k)
    upper = idx[:, None] < idx[None, :]  # j ranked higher than i at [j, i]
    over = (iou > iou_threshold) & valid[None, :] & valid[:, None]
    suppressed = jnp.any(over & upper, axis=0)
    return valid & ~suppressed


def _matrix_nms_decay(iou: jnp.ndarray, valid: jnp.ndarray, sigma: float = 0.5) -> jnp.ndarray:
    """Matrix-NMS (SoloV2) gaussian decay factors for score-sorted boxes."""
    k = iou.shape[0]
    idx = jnp.arange(k)
    upper = (idx[:, None] < idx[None, :]) & valid[None, :] & valid[:, None]
    ious = jnp.where(upper, iou, 0.0)  # [j, i]: iou of i with higher-ranked j
    ious_cmax = jnp.max(ious, axis=0)  # most-overlapped compensation per j
    decay = jnp.exp(-(ious**2 - ious_cmax[:, None] ** 2) / sigma)
    decay = jnp.where(upper, decay, 1.0)
    return jnp.min(decay, axis=0)


def _single_image_nms(
    boxes: jnp.ndarray,  # [N, 4]
    scores: jnp.ndarray,  # [N, C]
    score_threshold: float,
    iou_threshold: float,
    nms_top_k: int,
    max_predictions: int,
    multi_label: bool,
    class_agnostic: bool,
    mode: str,
    prefilter: str = "two_stage",
    class_top_k: int = 4,
    iou_dtype=None,
    scores_are_logits: bool = False,
) -> NMSOutput:
    n, c = scores.shape
    # The prefilter runs in the INPUT dtype and candidates are cast to fp32
    # only after the gather: when the model computes scores in bf16, casting
    # the full [N, C] map up-front materializes a 2x-larger tensor for zero
    # information (bf16->fp32 is lossless and monotone, so every comparison,
    # max and top_k picks the identical elements).
    #
    # ``scores_are_logits``: for heads whose scores are exactly
    # ``sigmoid(logits.astype(f32))`` (YOLO-NAS / PP-YOLOE), the caller may pass
    # the raw (bf16) logit map instead. Sigmoid is strictly monotone and
    # bf16->fp32 is exact, so max / top_k / argmax pick the IDENTICAL elements
    # on logits, and applying ``sigmoid`` to the K gathered fp32 candidates
    # reproduces the fp32 score values BIT-EXACTLY (asserted in
    # tests/test_ops_nms.py::test_logit_scores_bit_identical) — while the
    # [N, C] fp32 sigmoid map is never materialized (XLA dead-code-eliminates
    # it from the fused predict program: ~2 ms @ b128 yolo_nas_m 640px on v5e).
    # One caveat: where fp32 sigmoid SATURATES (|logit| > ~16.6 rounds to
    # exactly 1.0 or 0.0) distinct logits collapse to tied scores; the logit
    # path orders those candidates by their true logit while the score path
    # tie-breaks by index. Output scores are identical either way — only the
    # ordering (and, at the top_k boundary, membership) WITHIN an exact score
    # tie can differ, so live/exported programs must both use the same path
    # (sg_model._predict_program and conversion/export.py both pass logits).
    _to_score = jax.nn.sigmoid if scores_are_logits else (lambda v: v)
    if multi_label:
        if prefilter == "two_stage" and n > nms_top_k:
            # A flat top-k over N*C is a huge sort (~42 ms for 672k elements on
            # v5e). Two-stage: pick top anchors by per-anchor max first, then a
            # flat top-k within them. A candidate survives the flat stage only
            # if it beats the K-th best OVERALL score, and any such score's
            # anchor-max is >= it, so the anchor stage keeps every anchor that
            # could contribute unless >K anchors each hold higher maxima — in
            # which case those fill the quota anyway.
            #
            # The flat stage itself sorts only each anchor's top ``class_top_k``
            # classes (K*T elements instead of K*C — a K*C sort is ~15 ms for
            # 128×1024×80 on v5e, K*T is ~3 ms). Exact unless one anchor holds
            # more than T classes inside the true global top-K — vanishingly
            # rare at detection score distributions (TRT EfficientNMS makes the
            # same per-anchor assumption).
            k = min(nms_top_k, n)
            anchor_best = jnp.max(scores, axis=-1)
            _, aidx = jax.lax.top_k(anchor_best, k)
            sub = _to_score(scores[aidx].astype(jnp.float32))  # [k, C] — fp32 scores from here on
            t = min(class_top_k, c)
            vals, cls_of_t = jax.lax.top_k(sub, t)  # [k, T]
            top_scores, sidx = jax.lax.top_k(vals.reshape(-1), k)
            anchor_idx = aidx[sidx // t]
            cls_idx = cls_of_t[sidx // t, sidx % t]
        else:
            flat = scores.reshape(-1)  # [N*C]
            k = min(nms_top_k, flat.shape[0])
            top_scores, top_idx = jax.lax.top_k(flat, k)
            top_scores = _to_score(top_scores.astype(jnp.float32))
            anchor_idx = top_idx // c
            cls_idx = top_idx % c
    else:
        cls_idx_all = jnp.argmax(scores, axis=-1)
        best = jnp.max(scores, axis=-1)
        k = min(nms_top_k, n)
        top_scores, anchor_idx = jax.lax.top_k(best, k)
        top_scores = _to_score(top_scores.astype(jnp.float32))
        cls_idx = cls_idx_all[anchor_idx]

    cand_boxes = boxes[anchor_idx].astype(jnp.float32)  # [K, 4]
    valid = top_scores > score_threshold

    if class_agnostic:
        nms_boxes = cand_boxes
    else:
        nms_boxes = cand_boxes + (cls_idx.astype(cand_boxes.dtype) * _CLASS_OFFSET)[:, None]

    if iou_dtype is not None:
        # optional reduced-precision suppression matrix (~1.6% end-to-end on v5e
        # at K=1024; IoU threshold comparisons tolerate bf16's 0.4% ulp)
        iou = box_iou(nms_boxes.astype(iou_dtype), nms_boxes.astype(iou_dtype)).astype(jnp.float32)
    else:
        iou = box_iou(nms_boxes, nms_boxes)

    if mode == "exact":
        keep = _exact_keep_mask(iou, valid, iou_threshold)
    elif mode == "pallas":
        # exact-NMS semantics computed by the Pallas blocked kernel in VMEM
        # (ops/pallas/nms_kernel.py) instead of the K-step XLA fori_loop;
        # interprets off-TPU so results are backend-independent
        from super_gradients_tpu.ops.pallas.nms_kernel import BLOCK, pallas_exact_nms_keep

        interpret = "tpu" not in jax.devices()[0].device_kind.lower()
        kk = nms_boxes.shape[0]
        pad = (-kk) % BLOCK
        pb = jnp.pad(nms_boxes.astype(jnp.float32), ((0, pad), (0, 0)))
        pv = jnp.pad(valid, (0, pad))
        keep = pallas_exact_nms_keep(pb[None], pv[None], float(iou_threshold), interpret=interpret)[0][:kk] > 0
    elif mode == "fast":
        keep = _fast_keep_mask(iou, valid, iou_threshold)
    elif mode == "matrix":
        decay = _matrix_nms_decay(iou, valid)
        decayed = top_scores * decay
        keep = valid & (decayed > score_threshold)
    else:
        raise ValueError(f"Unknown NMS mode `{mode}` (exact|fast|matrix|pallas)")

    m = min(max_predictions, top_scores.shape[0])
    if mode == "matrix":
        # decayed scores are re-ordered → a real sort is required
        final_scores = jnp.where(keep, decayed, -1.0)
        out_scores, out_idx = jax.lax.top_k(final_scores, m)
        out_boxes = cand_boxes[out_idx]
        out_labels = cls_idx[out_idx].astype(jnp.int32)
        valid_out = out_scores > 0
        out_scores = jnp.where(valid_out, out_scores, 0.0)
    else:
        # candidates are already score-sorted, so the kept set is too — compact
        # with cumsum positions + a one-hot projection matmul (MXU) instead of a
        # top-k sort (TPU sorts are VPU-bound and slow at [B,1024])
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        proj = jax.nn.one_hot(jnp.where(keep, pos, m), m, dtype=jnp.float32)  # [K, m]
        payload = jnp.concatenate(
            [cand_boxes, jnp.where(keep, top_scores, 0.0)[:, None], cls_idx.astype(jnp.float32)[:, None]], axis=-1
        )  # [K, 6] — one matmul reads proj once
        packed = proj.T @ payload
        out_boxes, out_scores, out_labels = packed[:, :4], packed[:, 4], packed[:, 5].astype(jnp.int32)
        valid_out = jnp.arange(m) < jnp.sum(keep.astype(jnp.int32))
    out_boxes = jnp.where(valid_out[:, None], out_boxes, 0.0)
    out_labels = jnp.where(valid_out, out_labels, -1)
    num = jnp.sum(valid_out.astype(jnp.int32))
    if m < max_predictions:  # pad to the requested static size
        pad = max_predictions - m
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
        out_labels = jnp.pad(out_labels, (0, pad), constant_values=-1)
    return NMSOutput(out_boxes, out_scores, out_labels, num)


def batched_nms(
    boxes: jnp.ndarray,  # [B, N, 4] xyxy
    scores: jnp.ndarray,  # [B, N, C] (post-sigmoid)
    score_threshold: float = 0.25,
    iou_threshold: float = 0.7,
    nms_top_k: int = 1024,
    max_predictions: int = 300,
    multi_label: bool = True,
    class_agnostic: bool = False,
    mode: str = "exact",
    prefilter: str = "two_stage",
    class_top_k: int = 4,
    iou_dtype=None,
    scores_are_logits: bool = False,
) -> NMSOutput:
    """Batched class-aware NMS with fixed output shapes.

    Equivalent surface to ``PPYoloEPostPredictionCallback`` + torchvision
    ``batched_nms`` (reference ``post_prediction_callback.py:43-110``) but with the
    per-image Python loop replaced by ``vmap`` and static shapes throughout.
    ``prefilter``: "two_stage" (fast candidate selection via per-anchor
    ``class_top_k``, default) or "flat" (single top-k over N*C, reference-exact
    candidate set). ``scores_are_logits``: ``scores`` holds pre-sigmoid logits;
    bit-identical outputs with ``score_threshold`` still in probability space
    (see :func:`_single_image_nms`).
    """
    fn = lambda b, s: _single_image_nms(
        b, s, score_threshold, iou_threshold, nms_top_k, max_predictions, multi_label, class_agnostic, mode,
        prefilter, class_top_k, iou_dtype, scores_are_logits,
    )
    return jax.vmap(fn)(boxes, scores)


class PoseNMSOutput(NamedTuple):
    """Fixed-shape pose output (ref YoloNASPose post-prediction callback,
    yolo_nas_pose_post_prediction_callback.py:10-94)."""

    poses: jnp.ndarray  # [B, max_predictions, K, 3] (x, y, joint conf)
    boxes: jnp.ndarray  # [B, max_predictions, 4]
    scores: jnp.ndarray  # [B, max_predictions]
    num_detections: jnp.ndarray  # [B]


def _single_image_pose_nms(boxes, scores, poses, score_threshold, iou_threshold, nms_top_k, max_predictions, mode):
    """boxes [A,4], scores [A], poses [A,K,3]."""
    k = min(nms_top_k, scores.shape[0])
    top_scores, aidx = jax.lax.top_k(scores, k)
    top_scores = top_scores.astype(jnp.float32)
    cand_boxes = boxes[aidx].astype(jnp.float32)
    cand_poses = poses[aidx].astype(jnp.float32)
    valid = top_scores > score_threshold

    iou = box_iou(cand_boxes, cand_boxes)
    if mode == "exact":
        keep = _exact_keep_mask(iou, valid, iou_threshold)
    else:
        keep = _fast_keep_mask(iou, valid, iou_threshold)
    final_scores = jnp.where(keep, top_scores, -1.0)

    m = min(max_predictions, k)
    out_scores, oidx = jax.lax.top_k(final_scores, m)
    out_boxes = cand_boxes[oidx]
    out_poses = cand_poses[oidx]
    valid_out = out_scores > 0
    out_scores = jnp.where(valid_out, out_scores, 0.0)
    out_boxes = jnp.where(valid_out[:, None], out_boxes, 0.0)
    out_poses = jnp.where(valid_out[:, None, None], out_poses, 0.0)
    num = jnp.sum(valid_out.astype(jnp.int32))
    if m < max_predictions:
        pad = max_predictions - m
        out_poses = jnp.pad(out_poses, ((0, pad), (0, 0), (0, 0)))
        out_boxes = jnp.pad(out_boxes, ((0, pad), (0, 0)))
        out_scores = jnp.pad(out_scores, (0, pad))
    return PoseNMSOutput(out_poses, out_boxes, out_scores, num)


def batched_pose_nms(
    boxes: jnp.ndarray,  # [B, A, 4]
    scores: jnp.ndarray,  # [B, A] or [B, A, 1]
    pose_coords: jnp.ndarray,  # [B, A, K, 2]
    pose_scores: jnp.ndarray,  # [B, A, K]
    score_threshold: float = 0.1,
    iou_threshold: float = 0.7,
    nms_top_k: int = 1024,
    max_predictions: int = 30,
    mode: str = "exact",
) -> PoseNMSOutput:
    """Single-class NMS carrying per-anchor keypoint payloads (vmapped)."""
    if scores.ndim == 3:
        scores = scores[..., 0]
    poses = jnp.concatenate([pose_coords, pose_scores[..., None]], axis=-1)  # [B, A, K, 3]
    fn = lambda b, s, p: _single_image_pose_nms(
        b, s, p, score_threshold, iou_threshold, nms_top_k, max_predictions, mode
    )
    return jax.vmap(fn)(boxes, scores, poses)
