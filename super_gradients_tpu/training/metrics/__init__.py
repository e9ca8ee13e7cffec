"""Metrics as functional accumulators.

Reference parity: torchmetrics-based collections (``training/metrics/``,
``metrics/classification_metrics.py:41,53``). Here a Metric owns a pytree state:
``init() -> state``, ``update(state, outputs, targets) -> state`` (jittable, runs on
device inside the eval step), ``compute(state) -> float`` (host). DDP sync is free:
states live on the mesh and the final compute sums replicated counters.
"""

from super_gradients_tpu.training.metrics.classification import Accuracy, Top5, ToyTestClassificationMetric  # noqa: F401
from super_gradients_tpu.training.metrics.base import Metric, MetricCollection  # noqa: F401
from super_gradients_tpu.training.metrics.detection import (  # noqa: F401
    DetectionMetrics,
    DetectionMetrics_050,
    DetectionMetrics_050_095,
    DetectionMetrics_075,
)
from super_gradients_tpu.training.metrics.segmentation import Dice, IoU, PixelAccuracy  # noqa: F401
from super_gradients_tpu.training.metrics.pose_estimation import PoseEstimationMetrics  # noqa: F401
from super_gradients_tpu.training.metrics.depth import DeltaMetric, DepthMAE, DepthMSE, DepthRMSE  # noqa: F401
from super_gradients_tpu.common.registry import METRICS


def get_metric(name_or_metric):
    from super_gradients_tpu.common.factories import BaseFactory

    if isinstance(name_or_metric, (str, dict)):
        return BaseFactory(METRICS).get(name_or_metric)
    return name_or_metric
