"""Model zoo surface: ``models.get(name, ...)`` (reference ``super_gradients.training.models``)."""

from super_gradients_tpu.models import all_models  # noqa: F401  (registers architectures)
from super_gradients_tpu.models.model_factory import ModelSpec, convert_from_torch, get, get_architecture
from super_gradients_tpu.models.sg_model import (
    ClassificationModel,
    DetectionModel,
    SegmentationModel,
    SgModel,
)
from super_gradients_tpu.common.registry import ARCHITECTURES


def list_models():
    return sorted(ARCHITECTURES)


__all__ = [
    "get",
    "get_architecture",
    "convert_from_torch",
    "list_models",
    "ModelSpec",
    "SgModel",
    "DetectionModel",
    "ClassificationModel",
    "SegmentationModel",
]
