"""Classification metrics (reference ``metrics/classification_metrics.py:41-93``)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_metric
from super_gradients_tpu.training.metrics.base import Metric


@register_metric("Accuracy")
class Accuracy(Metric):
    name = "Accuracy"

    def init(self):
        return {"correct": jnp.zeros(()), "total": jnp.zeros(())}

    def update(self, state, outputs, targets):
        preds = jnp.argmax(outputs, axis=-1)
        if targets.ndim == outputs.ndim:  # one-hot
            targets = jnp.argmax(targets, axis=-1)
        correct = jnp.sum(preds == targets)
        return {"correct": state["correct"] + correct, "total": state["total"] + preds.size}

    def compute(self, state) -> Dict[str, float]:
        total = float(state["total"])
        return {self.name: float(state["correct"]) / total if total else 0.0}


@register_metric("Top5")
class Top5(Metric):
    name = "Top5"

    def init(self):
        return {"correct": jnp.zeros(()), "total": jnp.zeros(())}

    def update(self, state, outputs, targets):
        if targets.ndim == outputs.ndim:
            targets = jnp.argmax(targets, axis=-1)
        k = min(5, outputs.shape[-1])
        topk = jnp.argsort(-outputs, axis=-1)[..., :k]
        correct = jnp.sum(jnp.any(topk == targets[..., None], axis=-1))
        return {"correct": state["correct"] + correct, "total": state["total"] + targets.size}

    def compute(self, state) -> Dict[str, float]:
        total = float(state["total"])
        return {self.name: float(state["correct"]) / total if total else 0.0}


@register_metric("ToyTestClassificationMetric")
class ToyTestClassificationMetric(Metric):
    """Constant metric for tests (ref classification_metrics.py:81)."""

    name = "ToyTestClassificationMetric"

    def init(self):
        return {}

    def update(self, state, outputs, targets):
        return state

    def compute(self, state):
        return {self.name: 0.0}
