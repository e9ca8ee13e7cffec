"""Model export: AOT-compiled serialized artifacts.

Reference parity: ``model.export()`` (``module_interfaces/exportable_detector.py:144``)
produces an ONNX graph with embedded preprocessing + NMS. The TPU-native analogue is a
``jax.export`` StableHLO artifact of the SAME fused program — standardize → forward →
DFL decode → batched NMS — serialized to one file, reloadable without the model code
(``jax.export.deserialize``), runnable on any JAX backend and AOT-compilable for
serving.

Output formats mirror the reference (exportable_detector.py BATCHED/FLAT):
- BATCHED: NMSOutput arrays [B, max_predictions, ...] + num_detections [B]
- FLAT:    [N, 7] rows (batch_idx, x1, y1, x2, y2, score, label) — derivable client-side
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass
class ExportResult:
    """ref ObjectDetectionModelExportResult (exportable_detector.py:94)."""

    output_path: str
    input_shape: Tuple[int, ...]
    input_dtype: str
    usage_instructions: str

    def __repr__(self):
        return self.usage_instructions



def _photometric_fn(model, preprocessing: bool):
    """In-graph preprocessing for the exported artifact: the model's attached
    processing pipeline's photometric steps (ref exportable_detector preprocessing
    module built from get_equivalent_photometric_module, processing.py:87);
    falls back to /255 standardization."""
    if not preprocessing:
        return None
    proc = model.get_processing_params() if hasattr(model, "get_processing_params") else None
    fn = proc.get_equivalent_photometric_fn() if proc is not None and hasattr(proc, "get_equivalent_photometric_fn") else None
    return fn if fn is not None else (lambda x: x / 255.0)


def export_detection_model(
    model,
    output_path: str,
    batch_size: int = 1,
    image_hw: Optional[Tuple[int, int]] = None,
    confidence_threshold: float = 0.25,
    nms_threshold: float = 0.7,
    nms_top_k: int = 1024,
    max_predictions: int = 300,
    fuse_model: bool = True,
    bf16: bool = True,
    nms_mode: str = "exact",
    preprocessing: bool = True,
    quantization_mode: Optional[str] = None,
    calibration_table=None,
) -> ExportResult:
    """Serialize the fused predict program (ref exportable_detector.py:144-634).

    ``quantization_mode="int8"`` (ref exportable_detector.py:144 + YOLONAS.md:17-25
    INT8 engines) bakes the int8 serving numerics INTO the artifact: weights are
    snapped to the per-channel int8 grid and, given a ``calibration_table``
    (:func:`super_gradients_tpu.training.quantization.ptq` /
    ``QuantizationCalibrator``), every calibrated module's activations pass
    through the calibrated int8 fake-quant — so the exported StableHLO reproduces
    an int8 engine's ACCURACY exactly.

    It is an accuracy simulation, NOT a throughput mode. Measured on v5e
    (round 4): fake-quant (quantize-dequantize) convs compile to the bf16 conv
    path (1.03x), and even true int8 ``lax.conv``/im2col-``dot_general``
    lowerings reach at best ~1.1-1.3x on deep layers while LOSING on the
    end-to-end program — bf16 convs already run at ~MXU peak (217-225 TF) on
    this generation, so unlike the reference's T4/TensorRT story
    (``YOLONAS.md:17-21`` INT8 = 1.5x FP16) there is no int8 serving speedup to
    harvest. Use int8 export to validate deployment accuracy; serve in bf16.
    """
    from jax import export as jax_export

    from super_gradients_tpu.ops.nms import NMSOutput, batched_nms

    try:
        jax_export.register_namedtuple_serialization(NMSOutput, serialized_name="NMSOutput")
    except ValueError:
        pass  # already registered

    if not hasattr(model, "_infer_module_and_vars"):
        raise TypeError(
            f"export_detection_model requires a DetectionModel; got task `{getattr(model, 'task', '?')}`"
        )
    if quantization_mode not in (None, "int8"):
        raise ValueError(f"quantization_mode must be None or 'int8', got {quantization_mode!r}")
    image_hw = image_hw or model._input_hw
    module, variables = model._infer_module_and_vars(fuse_model, bf16)
    in_dtype = jnp.bfloat16 if bf16 else jnp.float32
    photometric = _photometric_fn(model, preprocessing)

    apply_fn = module.apply
    if quantization_mode == "int8":
        from super_gradients_tpu.training.quantization import fake_quantize_params, make_qat_forward

        variables = dict(variables)
        variables["params"] = fake_quantize_params(variables["params"])
        if calibration_table is not None:
            apply_fn, _ = make_qat_forward(module, {
                "calibration_table": calibration_table,
                "quantize_weights": False,  # already snapped above
            })
        else:
            logger.warning("int8 export without calibration_table: weights are int8-gridded "
                           "but activations stay float (pass ptq()'s table for full int8 numerics)")

    def program(images):
        x = images.astype(in_dtype)
        if photometric is not None:
            x = photometric(x).astype(in_dtype)
        out = apply_fn(variables, x, train=False)
        # same NMS input as the live predict program (sg_model._predict_program):
        # heads with the sigmoid contract feed raw logits so the exported and
        # live programs stay candidate-for-candidate identical (incl. ordering
        # inside saturated-score ties — see ops/nms.py scores_are_logits)
        use_logits = type(out).__name__ == "YoloNASOutputs"
        return batched_nms(
            out.pred_bboxes,
            out.cls_logits if use_logits else out.pred_scores,
            score_threshold=confidence_threshold,
            iou_threshold=nms_threshold,
            nms_top_k=nms_top_k,
            max_predictions=max_predictions,
            mode=nms_mode,
            scores_are_logits=use_logits,
        )

    spec = jax.ShapeDtypeStruct((batch_size, image_hw[0], image_hw[1], 3), jnp.uint8 if preprocessing else jnp.float32)
    exported = jax_export.export(jax.jit(program))(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(output_path)) or ".", exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(blob)

    usage = (
        f"Exported fused detection program to {output_path} ({len(blob) / 1e6:.1f} MB).\n"
        f"Input: uint8 [{batch_size}, {image_hw[0]}, {image_hw[1]}, 3] (RGB, 0-255).\n"
        "Load and run:\n"
        "    from jax import export\n"
        f"    exported = export.deserialize(open({output_path!r}, 'rb').read())\n"
        "    boxes, scores, labels, num_det = exported.call(images)\n"
        f"Outputs (BATCHED format): boxes [{batch_size}, {max_predictions}, 4] xyxy, "
        f"scores/labels [{batch_size}, {max_predictions}], num_detections [{batch_size}]."
    )
    logger.info(usage.splitlines()[0])
    return ExportResult(output_path, spec.shape, str(spec.dtype), usage)


def export_pose_estimation_model(
    model,
    output_path: str,
    batch_size: int = 1,
    image_hw: Optional[Tuple[int, int]] = None,
    confidence_threshold: float = 0.5,
    nms_threshold: float = 0.7,
    nms_top_k: int = 1024,
    max_predictions: int = 30,
    bf16: bool = True,
    nms_mode: str = "exact",
    preprocessing: bool = True,
) -> ExportResult:
    """Serialize the fused pose predict program: standardize → forward → pose decode →
    pose-NMS (ref module_interfaces/exportable_pose_estimation.py ExportablePoseEstimationModel
    — same BATCHED output contract: num_detections/boxes/scores/poses)."""
    from jax import export as jax_export

    from super_gradients_tpu.ops.nms import PoseNMSOutput, batched_pose_nms

    try:
        jax_export.register_namedtuple_serialization(PoseNMSOutput, serialized_name="PoseNMSOutput")
    except ValueError:
        pass

    if getattr(model, "task", None) != "pose_estimation":
        raise TypeError(f"export_pose_estimation_model requires a pose model; got task `{getattr(model, 'task', '?')}`")
    image_hw = image_hw or model._input_hw
    variables = model.variables
    if bf16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables
        )
    module = model.module
    in_dtype = jnp.bfloat16 if bf16 else jnp.float32
    photometric = _photometric_fn(model, preprocessing)

    def program(images):
        x = images.astype(in_dtype)
        if photometric is not None:
            x = photometric(x).astype(in_dtype)
        out = module.apply(variables, x, train=False)
        return batched_pose_nms(
            out.pred_bboxes.astype(jnp.float32),
            out.pred_scores.astype(jnp.float32),
            out.pred_pose_coords.astype(jnp.float32),
            out.pred_pose_scores.astype(jnp.float32),
            score_threshold=confidence_threshold,
            iou_threshold=nms_threshold,
            nms_top_k=nms_top_k,
            max_predictions=max_predictions,
            mode=nms_mode,
        )

    spec = jax.ShapeDtypeStruct((batch_size, image_hw[0], image_hw[1], 3), jnp.uint8 if preprocessing else jnp.float32)
    exported = jax_export.export(jax.jit(program))(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(output_path)) or ".", exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(blob)
    usage = (
        f"Exported fused pose-estimation program to {output_path} ({len(blob) / 1e6:.1f} MB).\n"
        f"Input: uint8 [{batch_size}, {image_hw[0]}, {image_hw[1]}, 3] (RGB, 0-255).\n"
        "Load: jax.export.deserialize(...).call(images) -> "
        f"poses [{batch_size}, {max_predictions}, K, 3], boxes [..., 4], scores, num_detections."
    )
    logger.info(usage.splitlines()[0])
    return ExportResult(output_path, spec.shape, str(spec.dtype), usage)


def export_segmentation_model(
    model,
    output_path: str,
    batch_size: int = 1,
    image_hw: Optional[Tuple[int, int]] = None,
    confidence_threshold: float = 0.5,
    bf16: bool = True,
    preprocessing: bool = True,
) -> ExportResult:
    """Serialize the fused segmentation program: standardize → forward → decode to a
    [B, H, W] int32 class-index map (ref module_interfaces/exportable_segmentation.py
    SemanticSegmentationDecodingModule argmax / BinarySegmentationDecodingModule
    threshold)."""
    from jax import export as jax_export

    if getattr(model, "task", None) != "segmentation":
        raise TypeError(f"export_segmentation_model requires a segmentation model; got task `{getattr(model, 'task', '?')}`")
    image_hw = image_hw or model._input_hw
    variables = model.variables
    if bf16:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables
        )
    module = model.module
    in_dtype = jnp.bfloat16 if bf16 else jnp.float32
    binary = model.num_classes == 1
    photometric = _photometric_fn(model, preprocessing)

    def program(images):
        x = images.astype(in_dtype)
        if photometric is not None:
            x = photometric(x).astype(in_dtype)
        logits = module.apply(variables, x, train=False)
        if isinstance(logits, (tuple, list)):
            logits = logits[0]  # aux heads: first tensor is the class prediction
        logits = logits.astype(jnp.float32)
        if binary:
            return (jax.nn.sigmoid(logits[..., 0]) > confidence_threshold).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    spec = jax.ShapeDtypeStruct((batch_size, image_hw[0], image_hw[1], 3), jnp.uint8 if preprocessing else jnp.float32)
    exported = jax_export.export(jax.jit(program))(spec)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(output_path)) or ".", exist_ok=True)
    with open(output_path, "wb") as f:
        f.write(blob)
    usage = (
        f"Exported fused segmentation program to {output_path} ({len(blob) / 1e6:.1f} MB).\n"
        f"Input: uint8 [{batch_size}, {image_hw[0]}, {image_hw[1]}, 3] (RGB, 0-255).\n"
        f"Load: jax.export.deserialize(...).call(images) -> class map int32 [{batch_size}, H, W]."
    )
    logger.info(usage.splitlines()[0])
    return ExportResult(output_path, spec.shape, str(spec.dtype), usage)


def load_exported(path: str):
    """Deserialize an exported program; returns object with ``.call(*args)``."""
    from jax import export as jax_export

    from super_gradients_tpu.ops.nms import NMSOutput, PoseNMSOutput

    for t, n in ((NMSOutput, "NMSOutput"), (PoseNMSOutput, "PoseNMSOutput")):
        try:
            jax_export.register_namedtuple_serialization(t, serialized_name=n)
        except ValueError:
            pass
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
