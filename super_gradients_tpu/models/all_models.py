"""Architecture registrations — the model zoo table.

Reference parity: ``common/object_names.py:211`` (``class Models``) + per-model
``@register_model`` decorators. Each builder returns a :class:`ModelSpec`.
"""

from __future__ import annotations

from typing import Dict, Optional

from super_gradients_tpu.common.registry import register_model
from super_gradients_tpu.inference.processing import (
    default_imagenet_processing,
    default_yolo_nas_coco_processing,
)
from super_gradients_tpu.models.class_names import COCO_DETECTION_CLASSES_LIST
from super_gradients_tpu.models.model_factory import ModelSpec


# ----------------------------------------------------------------- ResNet family


def _resnet_spec(num_blocks, block, name, num_classes=None, arch_params=None, **kw) -> ModelSpec:
    from super_gradients_tpu.conversion.torch_converter import resnet_key_mapper
    from super_gradients_tpu.models.classification.resnet import ResNet

    arch_params = arch_params or {}
    nc = num_classes or arch_params.get("num_classes", 1000)
    module = ResNet(
        num_blocks=tuple(num_blocks),
        num_classes=nc,
        block=block,
        width_mult=arch_params.get("width_mult", 1.0),
    )
    return ModelSpec(
        module=module,
        task="classification",
        num_classes=nc,
        input_hw=(224, 224),
        processing=default_imagenet_processing(),
        torch_key_mapper=resnet_key_mapper,
    )


@register_model("resnet18")
def resnet18(**kw):
    return _resnet_spec([2, 2, 2, 2], "basic", "resnet18", **kw)


@register_model("resnet34")
def resnet34(**kw):
    return _resnet_spec([3, 4, 6, 3], "basic", "resnet34", **kw)


@register_model("resnet50")
def resnet50(**kw):
    return _resnet_spec([3, 4, 6, 3], "bottleneck", "resnet50", **kw)


@register_model("resnet101")
def resnet101(**kw):
    return _resnet_spec([3, 4, 23, 3], "bottleneck", "resnet101", **kw)


@register_model("resnet152")
def resnet152(**kw):
    return _resnet_spec([3, 8, 36, 3], "bottleneck", "resnet152", **kw)


@register_model("resnet18_cifar")
def resnet18_cifar(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.resnet import CifarResNet

    nc = num_classes or 10
    return ModelSpec(
        module=CifarResNet(num_blocks=(2, 2, 2, 2), num_classes=nc, block="basic"),
        task="classification",
        num_classes=nc,
        input_hw=(32, 32),
    )


# --------------------------------------------------------------- YOLO-NAS family


def _yolo_nas_spec(config_fn, num_classes=None, arch_params=None, image_size: int = 640, **kw) -> ModelSpec:
    from super_gradients_tpu.conversion.torch_converter import yolo_nas_key_mapper
    from super_gradients_tpu.models.detection.yolo_nas import YoloNAS

    arch_params = arch_params or {}
    nc = num_classes or arch_params.get("num_classes", 80)
    cfg = config_fn(num_classes=nc, fused=arch_params.get("fused", "none"))
    return ModelSpec(
        module=YoloNAS(cfg),
        task="detection",
        num_classes=nc,
        input_hw=(image_size, image_size),
        config=cfg,
        processing=default_yolo_nas_coco_processing(image_size),
        class_names=COCO_DETECTION_CLASSES_LIST if nc == 80 else None,
        torch_key_mapper=yolo_nas_key_mapper,
    )


@register_model("yolo_nas_s")
def yolo_nas_s(**kw):
    from super_gradients_tpu.models.detection.yolo_nas import yolo_nas_s_config

    return _yolo_nas_spec(yolo_nas_s_config, **kw)


@register_model("yolo_nas_m")
def yolo_nas_m(**kw):
    from super_gradients_tpu.models.detection.yolo_nas import yolo_nas_m_config

    return _yolo_nas_spec(yolo_nas_m_config, **kw)


@register_model("yolo_nas_l")
def yolo_nas_l(**kw):
    from super_gradients_tpu.models.detection.yolo_nas import yolo_nas_l_config

    return _yolo_nas_spec(yolo_nas_l_config, **kw)
