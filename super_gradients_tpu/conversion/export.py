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
) -> ExportResult:
    """Serialize the fused predict program (ref exportable_detector.py:144-634)."""
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
    image_hw = image_hw or model._input_hw
    module, variables = model._infer_module_and_vars(fuse_model, bf16)
    in_dtype = jnp.bfloat16 if bf16 else jnp.float32

    def program(images):
        x = images.astype(in_dtype)
        if preprocessing:
            x = x / 255.0
        out = module.apply(variables, x, train=False)
        return batched_nms(
            out.pred_bboxes.astype(jnp.float32),
            out.pred_scores.astype(jnp.float32),
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


def load_exported(path: str):
    """Deserialize an exported program; returns object with ``.call(*args)``."""
    from jax import export as jax_export

    from super_gradients_tpu.ops.nms import NMSOutput

    try:
        jax_export.register_namedtuple_serialization(NMSOutput, serialized_name="NMSOutput")
    except ValueError:
        pass
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
