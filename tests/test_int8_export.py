"""INT8 serving artifact: export_detection_model(quantization_mode='int8').

The reference ships INT8 TRT engines with <=0.65 mAP drop
(exportable_detector.py:144 quantization_mode, YOLONAS.md:17-25); our artifact
bakes the int8-grid weights + calibrated activation fake-quant into the
StableHLO, so the exported numerics ARE the int8 serving numerics.
"""

import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.conversion.export import export_detection_model, load_exported
from super_gradients_tpu.training.quantization import QuantizationCalibrator


def _calibration_batches(n=4, hw=(64, 64)):
    rng = np.random.RandomState(0)
    return [(rng.rand(2, hw[0], hw[1], 3).astype(np.float32), None) for _ in range(n)]


def _temper_cls_head(model, factor=0.02):
    """Fresh-init fused YOLO-NAS at 64px emits cls logits of +-190 — every
    score sigmoid-saturates to EXACTLY 1.0, where fp32-vs-int8 score deltas
    vanish and the roundtrip comparison is vacuous. Scale the cls_pred kernels
    so logits land in a discriminating (-8, 8) range."""
    import jax

    def scale(path, leaf):
        name = "/".join(str(k.key) for k in path)
        return leaf * factor if "cls_pred" in name else leaf

    variables = dict(model.variables)
    variables["params"] = jax.tree_util.tree_map_with_path(scale, variables["params"])
    model.update_variables(variables)
    return model


@pytest.mark.heavy  # compile-heavy; nightly tier
def test_int8_export_roundtrip_and_close_to_fp32(tmp_path):
    model = _temper_cls_head(models.get("yolo_nas_s", num_classes=8, image_size=64))
    calibrator = QuantizationCalibrator(method="percentile")
    table = calibrator.calibrate_model(model, _calibration_batches(), num_batches=4)
    assert len(table.ranges) > 0

    fp_path = str(tmp_path / "det_fp32.sg")
    q_path = str(tmp_path / "det_int8.sg")
    common = dict(batch_size=1, image_hw=(64, 64), nms_top_k=64, max_predictions=10,
                  nms_mode="fast", bf16=False, confidence_threshold=0.0)
    export_detection_model(model, fp_path, **common)
    result = export_detection_model(model, q_path, quantization_mode="int8",
                                    calibration_table=table, **common)
    assert result.output_path == q_path

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    fp = load_exported(fp_path).call(img)
    q = load_exported(q_path).call(img)

    fp_boxes, fp_scores = np.asarray(fp[0]), np.asarray(fp[1])
    q_boxes, q_scores = np.asarray(q[0]), np.asarray(q[1])
    assert fp_boxes.shape == q_boxes.shape
    # int8 numerics differ from fp32 (quantization actually happened)
    assert not np.allclose(fp_scores, q_scores)

    # the artifact must reproduce the in-process int8 simulation EXACTLY:
    # same fake-quant graph (int8-grid weights + calibrated activation quant)
    import jax.numpy as jnp

    from super_gradients_tpu.ops.nms import batched_nms
    from super_gradients_tpu.training.quantization import fake_quantize_params, make_qat_forward

    module, variables = model._infer_module_and_vars(True, False)
    variables = dict(variables)
    variables["params"] = fake_quantize_params(variables["params"])
    apply_fn, _ = make_qat_forward(module, {"calibration_table": table, "quantize_weights": False})
    # replicate the exported program's preprocessing via the export helper
    from super_gradients_tpu.conversion.export import _photometric_fn

    photo = _photometric_fn(model, True)
    xin = jnp.asarray(img, jnp.float32)
    if photo is not None:
        xin = photo(xin)
    out = apply_fn(variables, xin.astype(jnp.float32), train=False)
    # feed cls_logits + scores_are_logits exactly like the exported program
    # (conversion/export.py program()): sigmoid happens AFTER the gather,
    # outside the QAT activation interceptor — pred_scores would additionally
    # re-quantize the sigmoid output (values can exceed 1.0 on the int8 grid)
    sim = batched_nms(out.pred_bboxes.astype(jnp.float32), out.cls_logits.astype(jnp.float32),
                      score_threshold=0.0, iou_threshold=0.7, nms_top_k=64, max_predictions=10,
                      mode="fast", scores_are_logits=True)
    np.testing.assert_allclose(q_scores, np.asarray(sim.scores), atol=1e-5)
    np.testing.assert_allclose(q_boxes, np.asarray(sim.boxes), atol=1e-3)


def test_int8_export_rejects_unknown_mode(tmp_path):
    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    with pytest.raises(ValueError, match="int8"):
        export_detection_model(model, str(tmp_path / "x.sg"), quantization_mode="int4")
