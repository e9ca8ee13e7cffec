"""Full-model forward-parity goldens: detection families vs the ACTUAL reference code.

The reference model classes (yolo_nas_variants.py:149, pp_yolo_e.py:407) are loaded
standalone via ref_loader, randomized, converted through conversion/torch_converter,
and the eval-mode decoded outputs (pred_bboxes, pred_scores) must agree — proving
architecture fidelity + converter correctness end-to-end (the north-star checkpoint-
compatibility pillar).
"""

import pytest

pytestmark = pytest.mark.parity

import ref_loader
import parity_utils

from super_gradients_tpu.models import model_factory
from super_gradients_tpu.conversion.torch_converter import PPYOLOE_RULES, YOLO_NAS_RULES


def _hp(**kw):
    HP = ref_loader.load_ref_module("super_gradients.training.utils.utils").HpmStruct
    return HP(**kw)


def test_yolo_nas_s_forward_parity():
    ref_loader.load_ref_module("super_gradients.training.models.detection_models.csp_darknet53")  # registers SPP
    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolo_nas.yolo_nas_variants")
    ref = m.YoloNAS_S(_hp(num_classes=7))
    mine = model_factory.get("yolo_nas_s", num_classes=7)
    parity_utils.detection_parity(ref, mine, input_hw=(64, 64), rules=YOLO_NAS_RULES)


def test_yolo_nas_m_forward_parity():
    ref_loader.load_ref_module("super_gradients.training.models.detection_models.csp_darknet53")
    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolo_nas.yolo_nas_variants")
    ref = m.YoloNAS_M(_hp(num_classes=5))
    mine = model_factory.get("yolo_nas_m", num_classes=5)
    parity_utils.detection_parity(ref, mine, input_hw=(64, 64), rules=YOLO_NAS_RULES)


def test_ppyoloe_s_forward_parity():
    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.pp_yolo_e.pp_yolo_e")
    ref = m.PPYoloE_S(_hp(num_classes=7))
    mine = model_factory.get("ppyoloe_s", num_classes=7)
    parity_utils.detection_parity(ref, mine, input_hw=(64, 64), rules=PPYOLOE_RULES)


def test_yolox_s_forward_parity():
    import torch

    from super_gradients_tpu.conversion.torch_converter import YOLOX_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolox")
    ref = m.YoloX_S(_hp(num_classes=7))
    mine = model_factory.get("yolox_s", num_classes=7)

    def ref_out_fn(o):
        out = o[0]  # [B, A, 4+1+C]: cxcywh + sigmoid(obj) + sigmoid(cls) (yolo_base.py:273-278)
        cx, cy, w, h = out[..., 0], out[..., 1], out[..., 2], out[..., 3]
        boxes = torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], dim=-1)
        return boxes, out[..., 4:5] * out[..., 5:]

    parity_utils.detection_parity(ref, mine, input_hw=(64, 64), rules=YOLOX_RULES, ref_out_fn=ref_out_fn)


def test_yolo_nas_pose_s_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import YOLO_NAS_POSE_RULES

    ref_loader.load_ref_module("super_gradients.training.models.detection_models.csp_darknet53")
    ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolo_nas.yolo_stages")
    ref_loader.load_ref_module("super_gradients.training.models.detection_models.yolo_nas.panneck")
    m = ref_loader.load_ref_module("super_gradients.training.models.pose_estimation_models.yolo_nas_pose.yolo_nas_pose_variants")
    ref = m.YoloNASPose_S(_hp())
    mine = model_factory.get("yolo_nas_pose_s")
    parity_utils.pose_parity(ref, mine, input_hw=(64, 64), rules=YOLO_NAS_POSE_RULES)


def test_ssd_mobilenet_v1_forward_parity():
    import torch

    from super_gradients_tpu.conversion.torch_converter import SSD_V1_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.ssd")
    ref = m.SSDMobileNetV1(_hp(num_classes=7))
    mine = model_factory.get("ssd_mobilenet_v1", num_classes=7)

    def ref_out_fn(o):
        out = o[0]  # [B, A, cx cy w h obj cls...] px (detection_modules.py:391-410)
        cx, cy, w, h = out[..., 0], out[..., 1], out[..., 2], out[..., 3]
        boxes = torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], dim=-1)
        return boxes, out[..., 5:]

    parity_utils.detection_parity(ref, mine, input_hw=(320, 320), rules=SSD_V1_RULES, ref_out_fn=ref_out_fn)


def test_ssd_lite_mobilenet_v2_forward_parity():
    import torch

    from super_gradients_tpu.conversion.torch_converter import SSD_LITE_V2_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.ssd")
    ref = m.SSDLiteMobileNetV2(_hp(num_classes=6))
    mine = model_factory.get("ssd_lite_mobilenet_v2", num_classes=6)

    def ref_out_fn(o):
        out = o[0]
        cx, cy, w, h = out[..., 0], out[..., 1], out[..., 2], out[..., 3]
        boxes = torch.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], dim=-1)
        return boxes, out[..., 5:]

    parity_utils.detection_parity(ref, mine, input_hw=(320, 320), rules=SSD_LITE_V2_RULES, ref_out_fn=ref_out_fn)


def test_dekr_w32_no_dc_forward_parity():
    import numpy as np
    import torch

    from super_gradients_tpu.conversion.torch_converter import DEKR_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.pose_estimation_models.dekr_hrnet")
    ref = parity_utils.randomize_reference(m.DEKRW32NODC(_hp(num_classes=17)), input_hw=(128, 128))
    mine = model_factory.get("dekr_w32_no_dc", num_classes=17)
    parity_utils.convert_into(ref, mine, DEKR_RULES)

    x = (np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32) - 0.5)
    with torch.no_grad():
        hm_ref, off_ref = ref(parity_utils.to_nchw(x))
    import jax.numpy as jnp

    out = mine.apply(jnp.asarray(x), train=False)
    parity_utils.assert_close(np.asarray(out.heatmaps).transpose(0, 3, 1, 2), hm_ref.numpy(), name="heatmaps")
    parity_utils.assert_close(np.asarray(out.offsets).transpose(0, 3, 1, 2), off_ref.numpy(), name="offsets")
