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


def dataclasses_replace_fused(cfg, fused):
    import dataclasses

    return dataclasses.replace(cfg, fused=fused) if fused != "none" else cfg


def _yolo_nas_spec(config_fn, num_classes=None, arch_params=None, image_size: int = 640, **kw) -> ModelSpec:
    from super_gradients_tpu.conversion.torch_converter import yolo_nas_key_mapper
    from super_gradients_tpu.models.detection.yolo_nas import YoloNAS

    arch_params = arch_params or {}
    nc = num_classes or arch_params.get("num_classes", 80)
    if "backbone" in arch_params:
        # full reference arch_params YAML schema (recipes/arch_params/
        # yolo_nas_*_arch_params.yaml) — reshape the detector from config
        from super_gradients_tpu.models.detection.customizable_detector import yolo_nas_config_from_arch_params

        cfg = dataclasses_replace_fused(yolo_nas_config_from_arch_params(arch_params, nc), arch_params.get("fused", "none"))
    else:
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
        init_hw=(64, 64),
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


# ------------------------------------------------------------ Segmentation zoo


def _seg_spec(module, nc, input_hw=(512, 1024), cfg=None, torch_key_mapper=None) -> ModelSpec:
    from super_gradients_tpu.inference.processing import (
        ClassificationResize,
        ComposeProcessing,
        NormalizeImage,
        StandardizeImage,
    )
    from super_gradients_tpu.models.class_names import CITYSCAPES_CLASSES_LIST

    return ModelSpec(
        module=module,
        task="segmentation",
        num_classes=nc,
        input_hw=input_hw,
        config=cfg,
        processing=ComposeProcessing(
            [
                ClassificationResize(input_hw[0]) if input_hw[0] == input_hw[1] else _SegResize(input_hw),
                StandardizeImage(255.0),
                NormalizeImage(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
            ]
        ),
        class_names=CITYSCAPES_CLASSES_LIST if nc == 19 else None,
        torch_key_mapper=torch_key_mapper,
        init_hw=(128, 128),  # conv-only seg families: params identical at any size
    )


class _SegResize:
    """Resize to fixed (h, w) for segmentation predict."""

    def __init__(self, output_hw):
        self.output_hw = tuple(output_hw)

    def preprocess_image(self, image):
        from super_gradients_tpu.inference.processing import ProcessingMetadata, _resize_bilinear

        h, w = image.shape[:2]
        return _resize_bilinear(image, self.output_hw), ProcessingMetadata(original_hw=(h, w))

    def postprocess_boxes(self, boxes, meta):
        return boxes

    def postprocess_keypoints(self, kpts, meta):
        return kpts

    def postprocess_segmentation(self, seg_map, meta):
        from super_gradients_tpu.inference.processing import _resize_nearest

        return _resize_nearest(seg_map, meta.original_hw)

    def infer_image_input_shape(self):
        return self.output_hw


def _stdc_seg(cfg_name, num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    import dataclasses

    from super_gradients_tpu.models.segmentation.stdc import STDC1_CFG, STDC2_CFG, STDCSegCfg, STDCSegmentation

    from super_gradients_tpu.conversion.torch_converter import stdc_key_mapper

    arch_params = arch_params or {}
    nc = num_classes or arch_params.get("num_classes", 19)
    backbone = STDC1_CFG if cfg_name == "stdc1" else STDC2_CFG
    cfg = STDCSegCfg(backbone=backbone, num_classes=nc, use_aux_heads=arch_params.get("use_aux_heads", True))
    return _seg_spec(STDCSegmentation(cfg), nc, tuple(input_hw), cfg, torch_key_mapper=stdc_key_mapper)


@register_model("stdc1_seg")
@register_model("stdc1_seg50")
@register_model("stdc1_seg75")
def stdc1_seg(**kw):
    return _stdc_seg("stdc1", **kw)


@register_model("stdc2_seg")
@register_model("stdc2_seg50")
@register_model("stdc2_seg75")
def stdc2_seg(**kw):
    return _stdc_seg("stdc2", **kw)


def _ppliteseg(variant, num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    import dataclasses

    from super_gradients_tpu.models.segmentation.ppliteseg import PP_LITE_B_CFG, PP_LITE_T_CFG, PPLiteSeg

    from super_gradients_tpu.conversion.torch_converter import ppliteseg_key_mapper

    arch_params = arch_params or {}
    nc = num_classes or arch_params.get("num_classes", 19)
    base = PP_LITE_T_CFG if variant == "t" else PP_LITE_B_CFG
    cfg = dataclasses.replace(base, num_classes=nc, use_aux_heads=arch_params.get("use_aux_heads", False))
    return _seg_spec(PPLiteSeg(cfg), nc, tuple(input_hw), cfg, torch_key_mapper=ppliteseg_key_mapper)


@register_model("pp_lite_t_seg")
@register_model("pp_lite_t_seg50")
@register_model("pp_lite_t_seg75")
def pp_lite_t_seg(**kw):
    return _ppliteseg("t", **kw)


@register_model("pp_lite_b_seg")
@register_model("pp_lite_b_seg50")
@register_model("pp_lite_b_seg75")
def pp_lite_b_seg(**kw):
    return _ppliteseg("b", **kw)


def _ddrnet(cfg, num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    import dataclasses

    from super_gradients_tpu.models.segmentation.ddrnet import DDRNet

    from super_gradients_tpu.conversion.torch_converter import ddrnet_key_mapper

    arch_params = arch_params or {}
    nc = num_classes or arch_params.get("num_classes", 19)
    cfg = dataclasses.replace(cfg, num_classes=nc, use_aux_heads=arch_params.get("use_aux_heads", False))
    return _seg_spec(DDRNet(cfg), nc, tuple(input_hw), cfg, torch_key_mapper=ddrnet_key_mapper)


@register_model("ddrnet_23")
def ddrnet_23(**kw):
    from super_gradients_tpu.models.segmentation.ddrnet import DDRNET_23_CFG

    return _ddrnet(DDRNET_23_CFG, **kw)


@register_model("ddrnet_23_slim")
def ddrnet_23_slim(**kw):
    from super_gradients_tpu.models.segmentation.ddrnet import DDRNET_23_SLIM_CFG

    return _ddrnet(DDRNET_23_SLIM_CFG, **kw)


@register_model("ddrnet_39")
def ddrnet_39(**kw):
    from super_gradients_tpu.models.segmentation.ddrnet import DDRNET_39_CFG

    return _ddrnet(DDRNET_39_CFG, **kw)


# ----------------------------------------------------------------- Pose zoo


def _pose_spec(config_fn, num_classes=None, arch_params=None, image_size: int = 640, **kw) -> ModelSpec:
    from super_gradients_tpu.models.class_names import COCO_POSE_EDGE_LINKS, COCO_POSE_KEYPOINTS
    from super_gradients_tpu.models.pose.yolo_nas_pose import YoloNASPose
    from super_gradients_tpu.models.sg_model import PoseEstimationModel

    arch_params = arch_params or {}
    nj = num_classes or arch_params.get("num_joints", 17)
    if "backbone" in arch_params:
        # full reference pose arch_params YAML (recipes/arch_params/
        # yolo_nas_pose_*_arch_params.yaml) — reshape from config
        from super_gradients_tpu.models.pose.yolo_nas_pose import yolo_nas_pose_config_from_arch_params

        cfg = yolo_nas_pose_config_from_arch_params(arch_params, num_joints=num_classes)
        nj = cfg.num_joints
    else:
        cfg = config_fn(num_joints=nj)
    import functools

    from super_gradients_tpu.conversion.torch_converter import yolo_nas_pose_key_mapper

    wrapper = functools.partial(PoseEstimationModel, edge_links=COCO_POSE_EDGE_LINKS if nj == 17 else None)
    return ModelSpec(
        module=YoloNASPose(cfg),
        task="pose_estimation",
        num_classes=nj,
        input_hw=(image_size, image_size),
        config=cfg,
        processing=default_yolo_nas_coco_processing(image_size),
        class_names=COCO_POSE_KEYPOINTS if nj == 17 else None,
        wrapper_cls=wrapper,
        torch_key_mapper=yolo_nas_pose_key_mapper,
        init_hw=(64, 64),
    )


@register_model("yolo_nas_pose_n")
def yolo_nas_pose_n(**kw):
    from super_gradients_tpu.models.pose.yolo_nas_pose import yolo_nas_pose_n_config

    return _pose_spec(yolo_nas_pose_n_config, **kw)


@register_model("yolo_nas_pose_s")
def yolo_nas_pose_s(**kw):
    from super_gradients_tpu.models.pose.yolo_nas_pose import yolo_nas_pose_s_config

    return _pose_spec(yolo_nas_pose_s_config, **kw)


@register_model("yolo_nas_pose_m")
def yolo_nas_pose_m(**kw):
    from super_gradients_tpu.models.pose.yolo_nas_pose import yolo_nas_pose_m_config

    return _pose_spec(yolo_nas_pose_m_config, **kw)


@register_model("yolo_nas_pose_l")
def yolo_nas_pose_l(**kw):
    from super_gradients_tpu.models.pose.yolo_nas_pose import yolo_nas_pose_l_config

    return _pose_spec(yolo_nas_pose_l_config, **kw)


# ------------------------------------------------- Classification zoo (extended)


def _cls_spec(module, nc, input_hw=(224, 224), torch_key_mapper=None) -> ModelSpec:
    return ModelSpec(
        module=module,
        task="classification",
        num_classes=nc,
        input_hw=input_hw,
        processing=default_imagenet_processing(crop=input_hw[0]),
        torch_key_mapper=torch_key_mapper,
    )


@register_model("mobilenet_v2")
def mobilenet_v2(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.mobilenet import MobileNetV2

    from super_gradients_tpu.conversion.torch_converter import mobilenet_v2_key_mapper

    arch_params = arch_params or {}
    nc = num_classes or 1000
    return _cls_spec(MobileNetV2(num_classes=nc, width_mult=arch_params.get("width_mult", 1.0)), nc,
                     torch_key_mapper=mobilenet_v2_key_mapper)


@register_model("mobilenet_v3_large")
def mobilenet_v3_large(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.mobilenet import MobileNetV3

    from super_gradients_tpu.conversion.torch_converter import mobilenet_v3_key_mapper

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes") or 1000
    return _cls_spec(MobileNetV3(num_classes=nc, mode=ap.get("mode") or "large", width_mult=float(ap.get("width_mult") or 1.0)),
                     nc, torch_key_mapper=mobilenet_v3_key_mapper)


@register_model("mobilenet_v3_small")
def mobilenet_v3_small(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.mobilenet import MobileNetV3

    from super_gradients_tpu.conversion.torch_converter import mobilenet_v3_key_mapper

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes") or 1000
    return _cls_spec(MobileNetV3(num_classes=nc, mode=ap.get("mode") or "small", width_mult=float(ap.get("width_mult") or 1.0)),
                     nc, torch_key_mapper=mobilenet_v3_key_mapper)


@register_model("mobilenet_v1")
def mobilenet_v1(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import mobilenet_v1_key_mapper
    from super_gradients_tpu.models.classification.mobilenet import MobileNetV1

    nc = num_classes or (arch_params or {}).get("num_classes", 10)
    # the reference model (mobilenet.py:33) is CIFAR-sized: 2x2 avg-pool head
    return _cls_spec(MobileNetV1(num_classes=nc), nc, input_hw=(64, 64),
                     torch_key_mapper=mobilenet_v1_key_mapper)


def _efficientnet(variant, num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.efficientnet import EFFICIENTNET_PARAMS, EfficientNet

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes") or 1000
    w, d, res, drop = EFFICIENTNET_PARAMS[variant]
    # reference arch_params schema (recipes/arch_params/efficientnet_b*_arch_params.yaml)
    w = float(ap.get("width_coefficient") or w)
    d = float(ap.get("depth_coefficient") or d)
    drop = float(ap.get("dropout_rate") or drop)
    res = int(ap.get("image_size") or res)
    from super_gradients_tpu.conversion.torch_converter import efficientnet_key_mapper

    return _cls_spec(EfficientNet(num_classes=nc, width_coeff=w, depth_coeff=d, dropout=drop), nc, (res, res),
                     torch_key_mapper=efficientnet_key_mapper)


for _v in ["b0", "b1", "b2", "b3", "b4"]:
    register_model(f"efficientnet_{_v}")(lambda num_classes=None, arch_params=None, _v=_v, **kw: _efficientnet(_v, num_classes, arch_params, **kw))


def _regnety(variant, num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.regnet import REGNETY_PARAMS, RegNetY

    from super_gradients_tpu.conversion.torch_converter import regnet_key_mapper

    nc = num_classes or 1000
    iw, slope, q, depth, gw, se = REGNETY_PARAMS[variant]
    return _cls_spec(
        RegNetY(num_classes=nc, initial_width=iw, slope=slope, quantized_param=q, depth=depth, group_width=gw, se_ratio=se), nc,
        torch_key_mapper=regnet_key_mapper,
    )


for _v in ["regnetY200", "regnetY400", "regnetY600", "regnetY800"]:
    register_model(_v)(lambda num_classes=None, arch_params=None, _v=_v, **kw: _regnety(_v, num_classes, arch_params, **kw))


@register_model("vit_base")
def vit_base_model(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import vit_key_mapper
    from super_gradients_tpu.models.classification.vit import vit_base

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes") or 1000
    kw2 = {}
    if ap.get("patch_size"):
        psz = ap["patch_size"]
        kw2["patch_size"] = int(psz[0] if isinstance(psz, (list, tuple)) else psz)
    im = ap.get("image_size")
    hw = (int(im[0]), int(im[1])) if isinstance(im, (list, tuple)) else ((int(im), int(im)) if im else (224, 224))
    return _cls_spec(vit_base(num_classes=nc, **kw2), nc, hw, torch_key_mapper=vit_key_mapper)


@register_model("vit_large")
def vit_large_model(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import vit_key_mapper
    from super_gradients_tpu.models.classification.vit import vit_large

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes") or 1000
    return _cls_spec(vit_large(num_classes=nc), nc, torch_key_mapper=vit_key_mapper)


@register_model("vgg16")
def vgg16(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.misc_models import VGG, VGG_CFGS

    from super_gradients_tpu.conversion.torch_converter import vgg_key_mapper

    nc = num_classes or 10
    return _cls_spec(VGG(cfg=VGG_CFGS["vgg16"], num_classes=nc), nc, (32, 32),
                     torch_key_mapper=vgg_key_mapper(VGG_CFGS["vgg16"]))


@register_model("vgg19_bn")
def vgg19(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.misc_models import VGG, VGG_CFGS

    from super_gradients_tpu.conversion.torch_converter import vgg_key_mapper

    nc = num_classes or 10
    return _cls_spec(VGG(cfg=VGG_CFGS["vgg19"], num_classes=nc), nc, (32, 32),
                     torch_key_mapper=vgg_key_mapper(VGG_CFGS["vgg19"]))


@register_model("lenet")
def lenet(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.misc_models import LeNet

    nc = num_classes or 10
    return _cls_spec(LeNet(num_classes=nc), nc, (32, 32))


@register_model("shufflenet_v2_x1_0")
def shufflenet_v2(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.misc_models import ShuffleNetV2

    from super_gradients_tpu.conversion.torch_converter import shufflenet_key_mapper

    nc = num_classes or 1000
    return _cls_spec(ShuffleNetV2(num_classes=nc), nc, torch_key_mapper=shufflenet_key_mapper)


@register_model("densenet121")
def densenet121(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import densenet_key_mapper
    from super_gradients_tpu.models.classification.misc_models import DenseNet

    nc = num_classes or 1000
    return _cls_spec(DenseNet(num_classes=nc), nc, torch_key_mapper=densenet_key_mapper)


@register_model("resnext50")
def resnext50(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import resnext_key_mapper
    from super_gradients_tpu.models.classification.misc_models import ResNeXt

    nc = num_classes or 1000
    return _cls_spec(ResNeXt(num_classes=nc), nc, torch_key_mapper=resnext_key_mapper)


# ------------------------------------------------------------ PP-YOLOE family


def _ppyoloe_spec(config_fn, num_classes=None, arch_params=None, image_size: int = 640, **kw) -> ModelSpec:
    from super_gradients_tpu.conversion.torch_converter import ppyoloe_key_mapper
    from super_gradients_tpu.models.detection.pp_yolo_e import PPYoloE

    import dataclasses

    arch_params = arch_params or {}
    nc = num_classes or arch_params.get("num_classes", 80)
    cfg = config_fn(num_classes=nc)
    if "width_mult" in arch_params or "depth_mult" in arch_params:
        # arch_params YAML group (recipes/arch_params/ppyoloe_*_arch_params.yaml)
        cfg = dataclasses.replace(
            cfg,
            width_mult=float(arch_params.get("width_mult", cfg.width_mult)),
            depth_mult=float(arch_params.get("depth_mult", cfg.depth_mult)),
        )
    return ModelSpec(
        module=PPYoloE(cfg),
        task="detection",
        num_classes=nc,
        input_hw=(image_size, image_size),
        config=cfg,
        processing=default_yolo_nas_coco_processing(image_size),
        class_names=COCO_DETECTION_CLASSES_LIST if nc == 80 else None,
        torch_key_mapper=ppyoloe_key_mapper,
        init_hw=(64, 64),
    )


@register_model("ppyoloe_s")
def ppyoloe_s(**kw):
    from super_gradients_tpu.models.detection.pp_yolo_e import ppyoloe_s_config

    return _ppyoloe_spec(ppyoloe_s_config, **kw)


@register_model("ppyoloe_m")
def ppyoloe_m(**kw):
    from super_gradients_tpu.models.detection.pp_yolo_e import ppyoloe_m_config

    return _ppyoloe_spec(ppyoloe_m_config, **kw)


@register_model("ppyoloe_l")
def ppyoloe_l(**kw):
    from super_gradients_tpu.models.detection.pp_yolo_e import ppyoloe_l_config

    return _ppyoloe_spec(ppyoloe_l_config, **kw)


@register_model("ppyoloe_x")
def ppyoloe_x(**kw):
    from super_gradients_tpu.models.detection.pp_yolo_e import ppyoloe_x_config

    return _ppyoloe_spec(ppyoloe_x_config, **kw)


# --------------------------------------------------------------- YOLOX family


def _yolox_spec(variant, num_classes=None, arch_params=None, image_size: int = 640, **kw) -> ModelSpec:
    from super_gradients_tpu.conversion.torch_converter import yolox_key_mapper
    from super_gradients_tpu.models.detection.yolox import YoloX, yolox_config

    import dataclasses

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 80)
    cfg = yolox_config(variant, nc)
    # reference arch_params YAML schema (recipes/arch_params/yolox_*_arch_params.yaml):
    # depth_mult_factor / width_mult_factor reshape the whole model
    if "depth_mult_factor" in ap or "width_mult_factor" in ap:
        cfg = dataclasses.replace(
            cfg,
            depth=float(ap.get("depth_mult_factor", cfg.depth)),
            width=float(ap.get("width_mult_factor", cfg.width)),
        )
    return ModelSpec(
        module=YoloX(cfg),
        task="detection",
        num_classes=nc,
        input_hw=(image_size, image_size),
        config=cfg,
        processing=default_yolo_nas_coco_processing(image_size),
        class_names=COCO_DETECTION_CLASSES_LIST if nc == 80 else None,
        torch_key_mapper=yolox_key_mapper,
        init_hw=(64, 64),
    )


for _v in ["yolox_n", "yolox_t", "yolox_s", "yolox_m", "yolox_l"]:
    register_model(_v)(lambda num_classes=None, arch_params=None, _v=_v, **kw: _yolox_spec(_v, num_classes, arch_params, **kw))



def _ssd_anchor_overrides(arch_params):
    """Translate the reference's ``heads.SSDHead.anchors`` YAML subtree
    (recipes/arch_params/ssd_*_arch_params.yaml DefaultBoxes spec) into
    SSDConfig field overrides."""
    a = ((arch_params or {}).get("heads", {}) or {}).get("SSDHead", {}).get("anchors", {})
    out = {}
    if a.get("fig_size"):
        out["fig_size"] = int(a["fig_size"])
    if a.get("feat_size"):
        out["feat_sizes"] = tuple(int(x) for x in a["feat_size"])
    if a.get("scales"):
        out["scales"] = tuple(int(x) for x in a["scales"])
    if a.get("aspect_ratios"):
        out["aspect_ratios"] = tuple(tuple(int(x) for x in ar) for ar in a["aspect_ratios"])
    if a.get("scale_xy"):
        out["scale_xy"] = float(a["scale_xy"])
    if a.get("scale_wh"):
        out["scale_wh"] = float(a["scale_wh"])
    nc = (arch_params or {}).get("heads", {}).get("SSDHead", {}).get("num_classes")
    if nc:
        out["num_classes"] = int(nc)
    return out


@register_model("ssd_lite_mobilenet_v2")
def ssd_lite_mobilenet_v2(num_classes=None, arch_params=None, image_size: int = 320, **kw) -> ModelSpec:
    from super_gradients_tpu.conversion.torch_converter import ssd_lite_mobilenet_v2_key_mapper
    from super_gradients_tpu.models.detection.ssd import SSDConfig, SSDLiteMobileNetV2

    import dataclasses

    over = _ssd_anchor_overrides(arch_params)
    nc = num_classes or (arch_params or {}).get("num_classes") or over.get("num_classes", 80)
    over["num_classes"] = nc
    cfg = dataclasses.replace(SSDConfig(fig_size=image_size), **over)
    return ModelSpec(
        module=SSDLiteMobileNetV2(cfg),
        task="detection",
        num_classes=nc,
        input_hw=(image_size, image_size),
        config=cfg,
        processing=default_yolo_nas_coco_processing(image_size),
        class_names=COCO_DETECTION_CLASSES_LIST if nc == 80 else None,
        torch_key_mapper=ssd_lite_mobilenet_v2_key_mapper,
    )


# -------------------------------------------- Classification zoo (final batch)


def _repvgg(variant, num_classes=None, arch_params=None, **kw):
    import dataclasses

    from super_gradients_tpu.models.classification.repvgg import REPVGG_VARIANTS, RepVGG

    from super_gradients_tpu.conversion.torch_converter import repvgg_key_mapper

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes") or 1000
    cfg = dataclasses.replace(REPVGG_VARIANTS[variant], num_classes=nc)
    # reference arch_params schema (recipes/arch_params/repvgg*_arch_params.yaml):
    # struct = blocks per stage; width_multiplier = [a, a, a, b]
    if ap.get("struct"):
        cfg = dataclasses.replace(cfg, blocks_per_stage=tuple(ap["struct"]))
    if ap.get("width_multiplier"):
        wm = list(ap["width_multiplier"])
        cfg = dataclasses.replace(cfg, width_a=float(wm[0]), width_b=float(wm[-1]))
    if ap.get("use_se"):
        cfg = dataclasses.replace(cfg, se_ratio=0.25)
    return _cls_spec(RepVGG(cfg), nc, torch_key_mapper=repvgg_key_mapper)


for _v in ["repvgg_a0", "repvgg_a1", "repvgg_a2", "repvgg_b0"]:
    register_model(_v)(lambda num_classes=None, arch_params=None, _v=_v, **kw: _repvgg(_v, num_classes, arch_params, **kw))


@register_model("preact_resnet18")
def preact_resnet18(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import preact_key_mapper
    from super_gradients_tpu.models.classification.more_models import PreActResNet

    nc = num_classes or 10
    return _cls_spec(PreActResNet(num_classes=nc), nc, (32, 32), torch_key_mapper=preact_key_mapper)


@register_model("googlenet_v1")
def googlenet_v1(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.more_models import GoogLeNet

    nc = num_classes or 1000
    return _cls_spec(GoogLeNet(num_classes=nc), nc)  # direct name parity; generic rules suffice


@register_model("senet18")
def senet18(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import senet_key_mapper
    from super_gradients_tpu.models.classification.more_models import SENetCifar

    nc = num_classes or 10
    return _cls_spec(SENetCifar(num_classes=nc), nc, (32, 32), torch_key_mapper=senet_key_mapper)


# ---------------------------------------------------- Segmentation (final batch)


@register_model("regseg48")
def regseg48(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    from super_gradients_tpu.conversion.torch_converter import regseg_key_mapper
    from super_gradients_tpu.models.segmentation.regseg import RegSeg, RegSegCfg

    nc = num_classes or 19
    return _seg_spec(RegSeg(RegSegCfg(num_classes=nc)), nc, tuple(input_hw), torch_key_mapper=regseg_key_mapper)


@register_model("unet")
def unet(num_classes=None, arch_params=None, input_hw=(512, 512), **kw):
    from super_gradients_tpu.conversion.torch_converter import unet_key_mapper
    from super_gradients_tpu.models.segmentation.unet_segformer import UNet, UNetCfg

    nc = num_classes or 19
    cfg = UNetCfg(num_classes=nc)
    return _seg_spec(UNet(cfg), nc, tuple(input_hw), cfg,
                     torch_key_mapper=lambda: unet_key_mapper(cfg))


def _segformer(cfg, num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    import dataclasses

    from super_gradients_tpu.conversion.torch_converter import segformer_key_mapper
    from super_gradients_tpu.models.segmentation.unet_segformer import SegFormer

    nc = num_classes or 19
    return _seg_spec(SegFormer(dataclasses.replace(cfg, num_classes=nc)), nc, tuple(input_hw),
                     torch_key_mapper=segformer_key_mapper)


@register_model("segformer_b0")
def segformer_b0(**kw):
    from super_gradients_tpu.models.segmentation.unet_segformer import SEGFORMER_B0

    return _segformer(SEGFORMER_B0, **kw)


@register_model("segformer_b1")
def segformer_b1(**kw):
    from super_gradients_tpu.models.segmentation.unet_segformer import SEGFORMER_B1

    return _segformer(SEGFORMER_B1, **kw)


@register_model("segformer_b2")
def segformer_b2(**kw):
    from super_gradients_tpu.models.segmentation.unet_segformer import SEGFORMER_B2

    return _segformer(SEGFORMER_B2, **kw)


@register_model("dekr_w32_no_dc")
@register_model("dekr_custom")
def dekr_w32(num_classes=None, arch_params=None, image_size: int = 512, **kw) -> ModelSpec:
    from super_gradients_tpu.models.class_names import COCO_POSE_EDGE_LINKS, COCO_POSE_KEYPOINTS
    from super_gradients_tpu.models.pose.dekr import DEKRConfig, DEKRPoseEstimationModel

    from super_gradients_tpu.conversion.torch_converter import dekr_key_mapper

    arch_params = arch_params or {}
    nj = num_classes or arch_params.get("num_joints", 17)
    spec = arch_params.get("SPEC") or {}
    stages = spec.get("STAGES") or {}
    head_hm = spec.get("HEAD_HEATMAP") or {}
    head_off = spec.get("HEAD_OFFSET") or {}
    width = arch_params.get("width") or (stages.get("NUM_CHANNELS") or [[32]])[0][0]
    cfg = DEKRConfig(
        num_joints=nj,
        width=int(width),
        stage_modules=tuple(stages["NUM_MODULES"]) if stages.get("NUM_MODULES") else DEKRConfig.stage_modules,
        heatmap_channels=int(head_hm.get("NUM_CHANNELS") or 32),
        heatmap_blocks=int(head_hm.get("NUM_BLOCKS") or 1),
        offset_channels_per_joint=int(head_off.get("NUM_CHANNELS_PERKPT") or 15),
        offset_blocks=int(head_off.get("NUM_BLOCKS") or 2),
        offset_block=arch_params.get("offset_block", "basic"),
    )
    return ModelSpec(
        module=DEKRPoseEstimationModel(cfg),
        task="generic",  # DEKR decode is heatmap-based; use dekr_decode directly
        num_classes=nj,
        input_hw=(image_size, image_size),
        config=cfg,
        class_names=COCO_POSE_KEYPOINTS if nj == 17 else None,
        torch_key_mapper=dekr_key_mapper,
        init_hw=(128, 128),
    )


@register_model("dpn26")
def dpn26(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import dpn_key_mapper
    from super_gradients_tpu.models.classification.dpn_pnasnet_beit import DPN, dpn26_kwargs

    nc = num_classes or 10
    return _cls_spec(DPN(num_classes=nc, **dpn26_kwargs()), nc, (32, 32), torch_key_mapper=dpn_key_mapper)


@register_model("dpn92")
def dpn92(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import dpn_key_mapper
    from super_gradients_tpu.models.classification.dpn_pnasnet_beit import DPN, dpn92_kwargs

    nc = num_classes or 10
    return _cls_spec(DPN(num_classes=nc, **dpn92_kwargs()), nc, (32, 32), torch_key_mapper=dpn_key_mapper)


@register_model("pnasnet")
def pnasnet(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import pnasnet_key_mapper
    from super_gradients_tpu.models.classification.dpn_pnasnet_beit import PNASNet

    nc = num_classes or 10
    return _cls_spec(PNASNet(num_classes=nc), nc, (32, 32), torch_key_mapper=pnasnet_key_mapper)


@register_model("beit_base_patch16_224")
def beit_base(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.dpn_pnasnet_beit import BEiT

    from super_gradients_tpu.conversion.torch_converter import beit_key_mapper

    nc = num_classes or 1000
    return _cls_spec(BEiT(num_classes=nc), nc, torch_key_mapper=beit_key_mapper)


@register_model("beit_large_patch16_224")
def beit_large(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.dpn_pnasnet_beit import BEiT

    from super_gradients_tpu.conversion.torch_converter import beit_key_mapper

    nc = num_classes or 1000
    return _cls_spec(BEiT(num_classes=nc, dim=1024, depth=24, heads=16), nc, torch_key_mapper=beit_key_mapper)


def _shelfnet_spec(variant, num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    from super_gradients_tpu.conversion.torch_converter import shelfnet_key_mapper
    from super_gradients_tpu.models.segmentation.shelfnet_laddernet import ShelfNet, ShelfNetCfg

    nc = num_classes or 19
    cfg = ShelfNetCfg(num_classes=nc, variant=variant,
                      aux_outputs=bool((arch_params or {}).get("aux_outputs", False)))
    return _seg_spec(ShelfNet(cfg), nc, tuple(input_hw), cfg, torch_key_mapper=shelfnet_key_mapper)


@register_model("shelfnet18_lw")
def shelfnet18_lw(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    return _shelfnet_spec("18_lw", num_classes, arch_params, input_hw, **kw)


@register_model("shelfnet34_lw")
def shelfnet34_lw(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    return _shelfnet_spec("34_lw", num_classes, arch_params, input_hw, **kw)


@register_model("laddernet_50")
def laddernet_50(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    from super_gradients_tpu.models.segmentation.shelfnet_laddernet import LadderNet, LadderNetCfg

    nc = num_classes or 19
    return _seg_spec(LadderNet(LadderNetCfg(num_classes=nc)), nc, tuple(input_hw))


# -------------------------------------------- variant + custom_* completion
# (reference object_names Models entries not covered above; each is a size
#  variant or an arch_params-parameterized "custom" constructor)


for _v in ["b5", "b6", "b7", "b8", "l2"]:
    register_model(f"efficientnet_{_v}")(lambda num_classes=None, arch_params=None, _v=_v, **kw: _efficientnet(_v, num_classes, arch_params, **kw))


@register_model("CustomizedEfficientnet")
def customized_efficientnet(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.efficientnet import EfficientNet

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 1000)
    return _cls_spec(
        EfficientNet(
            num_classes=nc,
            width_coeff=ap.get("width_coefficient", 1.0),
            depth_coeff=ap.get("depth_coefficient", 1.0),
            dropout=ap.get("dropout_rate", 0.2),
        ),
        nc,
        (ap.get("res", 224), ap.get("res", 224)),
    )


def _densenet(growth, blocks, init_feats, num_classes=None, **kw):
    from super_gradients_tpu.models.classification.misc_models import DenseNet

    nc = num_classes or 1000
    return _cls_spec(DenseNet(num_classes=nc, growth_rate=growth, block_config=tuple(blocks), init_features=init_feats), nc)


@register_model("densenet161")
def densenet161(num_classes=None, arch_params=None, **kw):
    return _densenet(48, (6, 12, 36, 24), 96, num_classes, **kw)


@register_model("densenet169")
def densenet169(num_classes=None, arch_params=None, **kw):
    return _densenet(32, (6, 12, 32, 32), 64, num_classes, **kw)


@register_model("densenet201")
def densenet201(num_classes=None, arch_params=None, **kw):
    return _densenet(32, (6, 12, 48, 32), 64, num_classes, **kw)


@register_model("custom_densenet")
def custom_densenet(num_classes=None, arch_params=None, **kw):
    ap = arch_params or {}
    return _densenet(
        ap.get("growth_rate", 32), tuple(ap.get("structure", (6, 12, 24, 16))),
        ap.get("num_init_features", 64), num_classes or ap.get("num_classes"), **kw
    )


for _v in ["repvgg_b1", "repvgg_b2", "repvgg_b3", "repvgg_d2se"]:
    register_model(_v)(lambda num_classes=None, arch_params=None, _v=_v, **kw: _repvgg(_v, num_classes, arch_params, **kw))


@register_model("repvgg_custom")
def repvgg_custom(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.repvgg import RepVGG, RepVGGCfg

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 1000)
    cfg = RepVGGCfg(
        num_classes=nc,
        blocks_per_stage=tuple(ap.get("struct", (2, 4, 14, 1))),
        width_a=ap.get("width_multiplier", [0.75, 2.5])[0] if "width_multiplier" in ap else ap.get("width_a", 0.75),
        width_b=ap.get("width_multiplier", [0.75, 2.5])[-1] if "width_multiplier" in ap else ap.get("width_b", 2.5),
    )
    return _cls_spec(RepVGG(cfg), nc)


@register_model("resnext101")
def resnext101(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.misc_models import ResNeXt

    nc = num_classes or 1000
    return _cls_spec(ResNeXt(num_classes=nc, num_blocks=(3, 4, 23, 3)), nc)


_SHUFFLENET_WIDTHS = {
    "shufflenet_v2_x0_5": (48, 96, 192),
    "shufflenet_v2_x1_5": (176, 352, 704),
    "shufflenet_v2_x2_0": (244, 488, 976),
}

for _v, _ch in _SHUFFLENET_WIDTHS.items():
    def _shufflenet(num_classes=None, arch_params=None, _ch=_ch, **kw):
        from super_gradients_tpu.models.classification.misc_models import ShuffleNetV2

        nc = num_classes or 1000
        return _cls_spec(ShuffleNetV2(num_classes=nc, stage_channels=_ch), nc)

    register_model(_v)(_shufflenet)


@register_model("shufflenet_v2_custom5")
def shufflenet_v2_custom5(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.misc_models import ShuffleNetV2

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 1000)
    return _cls_spec(ShuffleNetV2(num_classes=nc, stage_channels=tuple(ap.get("channels", (48, 96, 192)))), nc)


@register_model("vit_huge")
def vit_huge_model(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.vit import ViT

    nc = num_classes or 1000
    return _cls_spec(ViT(num_classes=nc, dim=1280, depth=32, heads=16), nc)


@register_model("darknet53")
def darknet53(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import darknet53_key_mapper
    from super_gradients_tpu.models.classification.darknet import Darknet53

    nc = num_classes or 1000
    return _cls_spec(Darknet53(num_classes=nc), nc, torch_key_mapper=darknet53_key_mapper)


@register_model("csp_darknet53")
def csp_darknet53(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import csp_darknet53_key_mapper
    from super_gradients_tpu.models.classification.darknet import CSPDarknet53

    nc = num_classes or 1000
    return _cls_spec(CSPDarknet53(num_classes=nc), nc, torch_key_mapper=csp_darknet53_key_mapper)


def _stdc_cls(cfg, num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.conversion.torch_converter import stdc_cls_key_mapper
    from super_gradients_tpu.models.segmentation.stdc import STDCClassification

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 1000)
    return _cls_spec(STDCClassification(backbone_cfg=cfg, num_classes=nc, dropout=ap.get("dropout", 0.2)), nc,
                     torch_key_mapper=stdc_cls_key_mapper)


@register_model("stdc1_classification")
def stdc1_classification(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.segmentation.stdc import STDC1_CFG

    return _stdc_cls(STDC1_CFG, num_classes, arch_params, **kw)


@register_model("stdc2_classification")
@register_model("stdc_custom_cls")
def stdc2_classification(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.segmentation.stdc import STDC2_CFG

    return _stdc_cls(STDC2_CFG, num_classes, arch_params, **kw)


@register_model("stdc_custom")
def stdc_custom(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    from super_gradients_tpu.models.segmentation.stdc import (
        STDC1_CFG, STDC2_CFG, STDCSegCfg, STDCSegmentation,
    )

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 19)
    backbone = STDC2_CFG if ap.get("backbone", "stdc1") == "stdc2" else STDC1_CFG
    cfg = STDCSegCfg(backbone=backbone, num_classes=nc, use_aux_heads=ap.get("use_aux_heads", True))
    return _seg_spec(STDCSegmentation(cfg), nc, tuple(input_hw), cfg)


@register_model("mobile_net_v2_135")
def mobile_net_v2_135(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.mobilenet import MobileNetV2

    nc = num_classes or 1000
    return _cls_spec(MobileNetV2(num_classes=nc, width_mult=1.35), nc)


@register_model("custom_mobilenet_v2")
def custom_mobilenet_v2(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.mobilenet import MobileNetV2

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 1000)
    return _cls_spec(MobileNetV2(num_classes=nc, width_mult=ap.get("width_mult", 1.0)), nc)


@register_model("mobilenet_v3_custom")
def mobilenet_v3_custom(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.mobilenet import MobileNetV3

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 1000)
    return _cls_spec(
        MobileNetV3(num_classes=nc, width_mult=ap.get("width_mult", 1.0), mode=ap.get("mode", "large")), nc
    )


@register_model("custom_resnet")
@register_model("custom_resnet50")
def custom_resnet(num_classes=None, arch_params=None, **kw):
    ap = arch_params or {}
    blocks = tuple(ap.get("structure", (3, 4, 6, 3)))
    return _resnet_spec(blocks, ap.get("block", "bottleneck"), "custom_resnet", num_classes, ap, **kw)


@register_model("resnet50_3343")
def resnet50_3343(num_classes=None, arch_params=None, **kw):
    return _resnet_spec([3, 3, 4, 3], "bottleneck", "resnet50_3343", num_classes, arch_params, **kw)


@register_model("custom_resnet_cifar")
@register_model("custom_resnet50_cifar")
def custom_resnet_cifar(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.resnet import CifarResNet

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 10)
    return ModelSpec(
        module=CifarResNet(num_blocks=tuple(ap.get("structure", (2, 2, 2, 2))), num_classes=nc,
                           block=ap.get("block", "basic")),
        task="classification",
        num_classes=nc,
        input_hw=(32, 32),
    )


@register_model("custom_regnet")
@register_model("custom_anynet")
@register_model("nas_regnet")
def custom_regnet(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.classification.regnet import RegNetY

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 1000)
    return _cls_spec(
        RegNetY(
            num_classes=nc,
            initial_width=ap.get("initial_width", 24),
            slope=ap.get("slope", 36.44),
            quantized_param=ap.get("quantized_param", 2.49),
            depth=ap.get("network_depth", ap.get("depth", 13)),
            group_width=ap.get("group_width", 8),
            se_ratio=ap.get("se_ratio", 0.25),
        ),
        nc,
    )


@register_model("custom_ddrnet_23")
def custom_ddrnet_23(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    from super_gradients_tpu.models.segmentation.ddrnet import DDRNet, DDRNetCfg

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 19)
    cfg = DDRNetCfg(
        num_classes=nc,
        planes=ap.get("planes", 64),
        highres_planes=ap.get("highres_planes", 128),
        head_planes=ap.get("head_planes", 128),
        use_aux_heads=ap.get("use_aux_heads", False),
    )
    return _seg_spec(DDRNet(cfg), nc, tuple(input_hw), cfg)


@register_model("custom_yolox")
def custom_yolox(num_classes=None, arch_params=None, image_size: int = 640, **kw):
    from super_gradients_tpu.models.detection.yolox import YoloX, YoloXConfig

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 80)
    cfg = YoloXConfig(num_classes=nc, depth=ap.get("depth_mult", ap.get("depth", 1.0)),
                      width=ap.get("width_mult", ap.get("width", 1.0)))
    return ModelSpec(
        module=YoloX(cfg),
        task="detection",
        num_classes=nc,
        input_hw=(image_size, image_size),
        config=cfg,
        processing=default_yolo_nas_coco_processing(image_size),
        class_names=COCO_DETECTION_CLASSES_LIST if nc == 80 else None,
    )


@register_model("yolox_x")
def yolox_x(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.detection.yolox import YoloX, YoloXConfig

    nc = num_classes or (arch_params or {}).get("num_classes", 80)
    cfg = YoloXConfig(num_classes=nc, depth=1.33, width=1.25)
    return ModelSpec(
        module=YoloX(cfg), task="detection", num_classes=nc, input_hw=(640, 640), config=cfg,
        processing=default_yolo_nas_coco_processing(640),
        class_names=COCO_DETECTION_CLASSES_LIST if nc == 80 else None,
    )


@register_model("ssd_mobilenet_v1")
def ssd_mobilenet_v1(num_classes=None, arch_params=None, image_size: int = 320, **kw):
    from super_gradients_tpu.conversion.torch_converter import ssd_mobilenet_v1_key_mapper
    from super_gradients_tpu.models.detection.ssd import SSDMobileNetV1, v1_config

    import dataclasses

    over = _ssd_anchor_overrides(arch_params)
    nc = num_classes or (arch_params or {}).get("num_classes") or over.get("num_classes", 80)
    over["num_classes"] = nc
    cfg = dataclasses.replace(v1_config(fig_size=image_size), **over)
    return ModelSpec(
        module=SSDMobileNetV1(cfg),
        task="detection",
        num_classes=nc,
        input_hw=(image_size, image_size),
        config=cfg,
        processing=default_yolo_nas_coco_processing(image_size),
        class_names=COCO_DETECTION_CLASSES_LIST if nc == 80 else None,
        torch_key_mapper=ssd_mobilenet_v1_key_mapper,
    )


@register_model("shelfnet50")
def shelfnet50(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    return _shelfnet_spec("50", num_classes, arch_params, input_hw, **kw)


@register_model("shelfnet50_3343")
def shelfnet50_3343(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    return _shelfnet_spec("50_3343", num_classes, arch_params, input_hw, **kw)


@register_model("shelfnet101")
def shelfnet101(num_classes=None, arch_params=None, input_hw=(512, 1024), **kw):
    return _shelfnet_spec("101", num_classes, arch_params, input_hw, **kw)


for _v in ["segformer_b3", "segformer_b4", "segformer_b5"]:
    def _segformer_big(num_classes=None, arch_params=None, input_hw=(512, 1024), _v=_v, **kw):
        from super_gradients_tpu.models.segmentation import unet_segformer as us

        cfg = {"segformer_b3": us.SEGFORMER_B3, "segformer_b4": us.SEGFORMER_B4, "segformer_b5": us.SEGFORMER_B5}[_v]
        return _segformer(cfg, num_classes, arch_params, input_hw, **kw)

    register_model(_v)(_segformer_big)


@register_model("unet_custom")
def unet_custom(num_classes=None, arch_params=None, input_hw=(512, 512), **kw):
    from super_gradients_tpu.conversion.torch_converter import unet_key_mapper
    from super_gradients_tpu.models.segmentation.unet_segformer import UNet, UNetCfg

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 19)
    bp = ap.get("backbone_params", {})
    dp = ap.get("decoder_params", {})
    cfg = UNetCfg(
        num_classes=nc,
        strides_list=tuple(bp.get("strides_list", (1, 2, 2, 2, 2))),
        width_list=tuple(bp.get("width_list", ap.get("widths", (64, 128, 256, 512, 512)))),
        num_blocks_list=tuple(bp.get("num_blocks_list", (2, 2, 2, 2, 2))),
        decoder_scale=dp.get("decoder_scale", 0.5),
        skip_expansion=dp.get("skip_expansion", 1.0),
        up_block_repeat_list=tuple(dp.get("up_block_repeat_list", (2, 2, 2, 1))),
        min_decoder_channels=dp.get("min_decoder_channels", 1),
        final_upsample_factor=ap.get("final_upsample_factor", 1),
        head_hidden_channels=ap.get("head_hidden_channels") or 0,
        dropout=ap.get("dropout", 0.0),
    )
    return _seg_spec(UNet(cfg), nc, tuple(input_hw), cfg,
                     torch_key_mapper=lambda: unet_key_mapper(cfg))


@register_model("unet_custom_cls")
def unet_custom_cls(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.segmentation.unet_segformer import UNetCfg, UNetClassifier

    ap = arch_params or {}
    nc = num_classes or ap.get("num_classes", 1000)
    cfg = UNetCfg(num_classes=nc, width_list=tuple(ap.get("widths", (64, 128, 256, 512, 1024))),
                  strides_list=(1, 2, 2, 2, 2))
    return _cls_spec(UNetClassifier(cfg, num_classes=nc), nc)


@register_model("pose_rescoring")
@register_model("pose_rescoring_coco")
@register_model("pose_rescoring_custom")
def pose_rescoring(num_classes=None, arch_params=None, **kw):
    from super_gradients_tpu.models.class_names import COCO_POSE_EDGE_LINKS
    from super_gradients_tpu.models.pose.rescoring_net import PoseRescoringNet

    ap = arch_params or {}
    nj = num_classes or ap.get("num_classes", 17)
    links = tuple(tuple(l) for l in ap.get("edge_links", COCO_POSE_EDGE_LINKS))
    module = PoseRescoringNet(
        num_classes=nj,
        hidden_channels=ap.get("hidden_channels", 256),
        num_layers=ap.get("num_layers", 3),
        edge_links=links,
    )
    return ModelSpec(module=module, task="pose_rescoring", num_classes=nj, input_hw=(len(links), 3))


@register_model("kd_module")
def kd_module(num_classes=None, arch_params=None, **kw):
    """KD wrapper: arch_params must carry ``student`` / ``teacher`` — either
    registered architecture names or already-built flax modules
    (ref kd_modules/kd_module.py + Models.KD_MODULE)."""
    from super_gradients_tpu.common.registry import ARCHITECTURES
    from super_gradients_tpu.training.losses.kd_losses import KDModule

    ap = dict(arch_params or {})
    # reference recipes spell these student_architecture/teacher_architecture
    # (imagenet_resnet50_kd.yaml:83-84) — accept both namings
    ap.setdefault("student", ap.get("student_architecture"))
    ap.setdefault("teacher", ap.get("teacher_architecture"))
    if not ap.get("student") or not ap.get("teacher"):
        raise ValueError("kd_module requires arch_params with `student`/`teacher` "
                         "(or student_architecture/teacher_architecture)")

    def resolve(entry):
        if isinstance(entry, str):
            params = ap.get(f"{entry}_arch_params") or ap.get("student_arch_params" if entry == ap["student"] else "teacher_arch_params")
            return ARCHITECTURES[entry](num_classes=num_classes, arch_params=params).module
        return entry

    student, teacher = resolve(ap["student"]), resolve(ap["teacher"])
    nc = num_classes or ap.get("num_classes", 1000)
    return ModelSpec(module=KDModule(student=student, teacher=teacher), task="classification", num_classes=nc, input_hw=(224, 224))
