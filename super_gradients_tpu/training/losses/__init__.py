"""Loss registry surface (reference ``training/losses/all_losses.py``)."""

from super_gradients_tpu.training.losses.classification_losses import (  # noqa: F401
    CrossEntropyLoss,
    LabelSmoothingCrossEntropyLoss,
)
from super_gradients_tpu.training.losses.ppyolo_loss import PPYoloELoss  # noqa: F401
from super_gradients_tpu.training.losses.yolo_nas_pose_loss import YoloNASPoseLoss  # noqa: F401
from super_gradients_tpu.training.losses.yolox_loss import YoloXDetectionLoss  # noqa: F401
from super_gradients_tpu.training.losses.ssd_loss import SSDLoss  # noqa: F401
from super_gradients_tpu.training.losses.kd_losses import KDLogitsLoss  # noqa: F401
from super_gradients_tpu.training.losses.dekr_loss import DEKRLoss  # noqa: F401
from super_gradients_tpu.training.losses.segmentation_losses import (  # noqa: F401
    DiceCEEdgeLoss,
    DiceLoss,
    OhemCELoss,
    STDCLoss,
    SegCrossEntropyLoss,
)
from super_gradients_tpu.common.registry import LOSSES


def get_loss(name_or_loss, criterion_params=None):
    if callable(name_or_loss):
        return name_or_loss
    if name_or_loss not in LOSSES:
        raise KeyError(f"Unknown loss `{name_or_loss}`; registered: {sorted(LOSSES)}")
    return LOSSES[name_or_loss](**(criterion_params or {}))
