"""Full-model forward-parity goldens: segmentation families vs the ACTUAL reference
code (segmentation_models/*.py loaded standalone via ref_loader)."""

import pytest
import ref_loader
import parity_utils

from super_gradients_tpu.models import model_factory


def _hp(**kw):
    HP = ref_loader.load_ref_module("super_gradients.training.utils.utils").HpmStruct
    return HP(**kw)


def test_ddrnet_23_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import DDRNET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.ddrnet")
    ref = m.DDRNet23(_hp(num_classes=7))
    mine = model_factory.get("ddrnet_23", num_classes=7)
    parity_utils.segmentation_parity(ref, mine, input_hw=(128, 256), rules=DDRNET_RULES)


def test_segformer_b0_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import SEGFORMER_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.segformer")
    ref = m.SegFormerB0(_hp(num_classes=7))
    mine = model_factory.get("segformer_b0", num_classes=7)
    parity_utils.segmentation_parity(ref, mine, input_hw=(128, 128), rules=SEGFORMER_RULES)


def test_stdc1_seg_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import STDC_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.stdc")
    ref = m.STDC1Seg(_hp(num_classes=7, use_aux_heads=False))
    mine = model_factory.get("stdc1_seg", num_classes=7, arch_params={"use_aux_heads": False})
    parity_utils.segmentation_parity(ref, mine, input_hw=(128, 256), rules=STDC_RULES)


def test_pp_lite_t_seg_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import PPLITESEG_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.ppliteseg")
    ref = m.PPLiteSegT(_hp(num_classes=7, use_aux_heads=False))
    mine = model_factory.get("pp_lite_t_seg", num_classes=7, arch_params={"use_aux_heads": False})
    parity_utils.segmentation_parity(ref, mine, input_hw=(128, 256), rules=PPLITESEG_RULES)


def test_regseg48_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import REGSEG_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.regseg")
    ref = m.RegSeg48(_hp(num_classes=7))
    mine = model_factory.get("regseg48", num_classes=7)
    parity_utils.segmentation_parity(ref, mine, input_hw=(128, 256), rules=REGSEG_RULES)
