"""Full-RESOLUTION forward-parity goldens vs the actual reference code.

The standard parity tier runs every family at 64x64 (SSD 320, DEKR 128) to
keep the suite fast; resolution-dependent behavior — 640px anchor grids, SPP
at large kernels, positional-embedding handling at 224+, seg heads at
Cityscapes-scale maps — is exercised here at each task's PRODUCTION shape
(ref eval sizes: YOLONAS.md 640px detection, model_zoo.md:78 Cityscapes
1024x2048 segmentation, vit at 224):

- yolo_nas_m       @ 640x640   (detection flagship)
- ppyoloe_s        @ 640x640   (detection)
- yolo_nas_pose_s  @ 640x640   (pose; resolution-scaled coord tolerance —
                                 see parity_utils.pose_parity docstring)
- ddrnet_23        @ 512x1024  (segmentation at half-Cityscapes, the ref's
                                 seg75 training crop scale)
- vit_base @224 and ssd_lite @320 already run at production shape in
  test_forward_parity_cls.py / test_yolox_ssd.py parity goldens.

Marked heavy + parity: one compile each at large spatial dims dominates
wall-clock (nightly tier, like the reference's GPU integration jobs).
"""

import pytest

pytestmark = [pytest.mark.parity, pytest.mark.heavy]

import parity_utils
import ref_loader

from super_gradients_tpu.models import model_factory


def _hp(**kw):
    HP = ref_loader.load_ref_module("super_gradients.training.utils.utils").HpmStruct
    return HP(**kw)


def test_yolo_nas_m_640_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import YOLO_NAS_RULES

    ref_loader.load_ref_module("super_gradients.training.models.detection_models.csp_darknet53")
    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolo_nas.yolo_nas_variants")
    ref = m.YoloNAS_M(_hp(num_classes=5))
    mine = model_factory.get("yolo_nas_m", num_classes=5)
    parity_utils.detection_parity(ref, mine, input_hw=(640, 640), rules=YOLO_NAS_RULES)


def test_ppyoloe_s_640_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import PPYOLOE_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.pp_yolo_e.pp_yolo_e")
    ref = m.PPYoloE_S(_hp(num_classes=7))
    mine = model_factory.get("ppyoloe_s", num_classes=7)
    parity_utils.detection_parity(ref, mine, input_hw=(640, 640), rules=PPYOLOE_RULES)


def test_yolo_nas_pose_s_640_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import YOLO_NAS_POSE_RULES

    ref_loader.load_ref_module("super_gradients.training.models.detection_models.csp_darknet53")
    ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolo_nas.yolo_stages")
    ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolo_nas.panneck")
    m = ref_loader.load_ref_module(
        "super_gradients.training.models.pose_estimation_models.yolo_nas_pose.yolo_nas_pose_variants"
    )
    ref = m.YoloNASPose_S(_hp())
    mine = model_factory.get("yolo_nas_pose_s")
    parity_utils.pose_parity(ref, mine, input_hw=(640, 640), rules=YOLO_NAS_POSE_RULES)


def test_ddrnet_23_512x1024_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import DDRNET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.ddrnet")
    ref = m.DDRNet23(_hp(num_classes=19))
    mine = model_factory.get("ddrnet_23", num_classes=19)
    parity_utils.segmentation_parity(ref, mine, input_hw=(512, 1024), rules=DDRNET_RULES)
