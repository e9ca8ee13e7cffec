"""Depth estimation metrics (ref metrics/depth_estimation_metrics.py):
MAE/MSE/RMSE and delta-threshold accuracies over valid-depth masks."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_metric
from super_gradients_tpu.training.metrics.base import Metric


class _DepthBase(Metric):
    def __init__(self, ignore_val: float = -1.0):
        self.ignore_val = ignore_val

    def init(self):
        return {"sum": jnp.zeros(()), "count": jnp.zeros(())}

    def _valid(self, targets):
        return (targets != self.ignore_val).astype(jnp.float32)


@register_metric("DepthMAE")
class DepthMAE(_DepthBase):
    name = "DepthMAE"
    greater_is_better = False

    def update(self, state, outputs, targets):
        outputs = outputs.reshape(targets.shape)
        m = self._valid(targets)
        return {"sum": state["sum"] + jnp.sum(jnp.abs(outputs - targets) * m), "count": state["count"] + m.sum()}

    def compute(self, state) -> Dict[str, float]:
        return {self.name: float(state["sum"]) / max(float(state["count"]), 1.0)}


@register_metric("DepthMSE")
class DepthMSE(_DepthBase):
    name = "DepthMSE"
    greater_is_better = False

    def update(self, state, outputs, targets):
        outputs = outputs.reshape(targets.shape)
        m = self._valid(targets)
        return {"sum": state["sum"] + jnp.sum(((outputs - targets) ** 2) * m), "count": state["count"] + m.sum()}

    def compute(self, state) -> Dict[str, float]:
        return {self.name: float(state["sum"]) / max(float(state["count"]), 1.0)}


@register_metric("DepthRMSE")
class DepthRMSE(DepthMSE):
    name = "DepthRMSE"

    def compute(self, state) -> Dict[str, float]:
        mse = float(state["sum"]) / max(float(state["count"]), 1.0)
        return {self.name: mse**0.5}


@register_metric("DeltaMetric")
class DeltaMetric(_DepthBase):
    """delta1/2/3: fraction of pixels with max(pred/gt, gt/pred) < 1.25^k."""

    name = "Delta1"

    def __init__(self, delta: float = 1.25, ignore_val: float = -1.0):
        super().__init__(ignore_val)
        self.delta = delta

    def update(self, state, outputs, targets):
        outputs = outputs.reshape(targets.shape)
        m = self._valid(targets)
        ratio = jnp.maximum(outputs / jnp.maximum(targets, 1e-9), targets / jnp.maximum(outputs, 1e-9))
        ok = ((ratio < self.delta) * m).sum()
        return {"sum": state["sum"] + ok, "count": state["count"] + m.sum()}

    def compute(self, state) -> Dict[str, float]:
        return {self.name: float(state["sum"]) / max(float(state["count"]), 1.0)}
