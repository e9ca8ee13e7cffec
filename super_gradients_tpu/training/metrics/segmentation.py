"""Segmentation metrics via device-side confusion-matrix accumulation.

Reference: ``metrics/segmentation_metrics.py`` (IoU :281, Dice :335,
PixelAccuracy :197). The confusion matrix is a one-hot matmul (MXU) per batch;
mIoU/Dice/accuracy derive from it at compute() — fully jit-friendly state.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_metric
from super_gradients_tpu.training.metrics.base import Metric


def _confusion_matrix(preds: jnp.ndarray, targets: jnp.ndarray, num_classes: int, ignore_index: int) -> jnp.ndarray:
    valid = (targets != ignore_index) & (targets < num_classes)
    t = jnp.where(valid, targets, 0)
    p = jnp.where(valid, preds, 0)
    t_oh = jax.nn.one_hot(t.reshape(-1), num_classes, dtype=jnp.float32) * valid.reshape(-1, 1)
    p_oh = jax.nn.one_hot(p.reshape(-1), num_classes, dtype=jnp.float32)
    return t_oh.T @ p_oh  # [C_true, C_pred]


class _ConfusionMatrixMetric(Metric):
    def __init__(self, num_classes: int = 19, ignore_index: int = 255):
        self.num_classes = num_classes
        self.ignore_index = ignore_index

    def init(self):
        return jnp.zeros((self.num_classes, self.num_classes), dtype=jnp.float32)

    def update(self, state, outputs, targets):
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        preds = jnp.argmax(logits, axis=-1)
        return state + _confusion_matrix(preds, targets.astype(jnp.int32), self.num_classes, self.ignore_index)


@register_metric("IoU")
class IoU(_ConfusionMatrixMetric):
    name = "IoU"

    def compute(self, cm) -> Dict[str, float]:
        import numpy as np

        cm = np.asarray(cm)
        tp = np.diag(cm)
        denom = cm.sum(0) + cm.sum(1) - tp
        present = cm.sum(1) > 0
        iou = np.where(denom > 0, tp / np.maximum(denom, 1e-9), 0.0)
        return {self.name: float(iou[present].mean()) if present.any() else 0.0}


@register_metric("Dice")
class Dice(_ConfusionMatrixMetric):
    name = "Dice"

    def compute(self, cm) -> Dict[str, float]:
        import numpy as np

        cm = np.asarray(cm)
        tp = np.diag(cm)
        denom = cm.sum(0) + cm.sum(1)
        present = cm.sum(1) > 0
        dice = np.where(denom > 0, 2 * tp / np.maximum(denom, 1e-9), 0.0)
        return {self.name: float(dice[present].mean()) if present.any() else 0.0}


class _BinaryPredMixin:
    """Binary (1-channel sigmoid) prediction decode (ref segmentation_metrics.py
    BinaryIOU/BinaryDice: threshold 0.5 on the sigmoid of the single logit)."""

    def update(self, state, outputs, targets):
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        if logits.shape[-1] == 1:
            preds = (jax.nn.sigmoid(logits[..., 0]) > 0.5).astype(jnp.int32)
        else:
            preds = jnp.argmax(logits, axis=-1)
        return state + _confusion_matrix(preds, targets.astype(jnp.int32), self.num_classes, self.ignore_index)


@register_metric("BinaryIOU")
@register_metric("BinaryIoU")
class BinaryIoU(_BinaryPredMixin, IoU):
    name = "BinaryIoU"

    def __init__(self, ignore_index: int = 255, **kw):
        super().__init__(num_classes=2, ignore_index=ignore_index)


@register_metric("BinaryDice")
class BinaryDice(_BinaryPredMixin, Dice):
    name = "BinaryDice"

    def __init__(self, ignore_index: int = 255, **kw):
        super().__init__(num_classes=2, ignore_index=ignore_index)


@register_metric("PixelAccuracy")
class PixelAccuracy(_ConfusionMatrixMetric):
    name = "PixelAccuracy"

    def compute(self, cm) -> Dict[str, float]:
        import numpy as np

        cm = np.asarray(cm)
        total = cm.sum()
        return {self.name: float(np.diag(cm).sum() / total) if total else 0.0}
