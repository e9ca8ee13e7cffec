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
