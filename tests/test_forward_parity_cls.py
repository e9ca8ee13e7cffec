"""Full-model forward-parity goldens: classification families vs the ACTUAL reference
code (classification_models/*.py loaded standalone via ref_loader)."""

import pytest
import ref_loader
import parity_utils

from super_gradients_tpu.models import model_factory
from super_gradients_tpu.conversion.torch_converter import RESNET_RULES


def _hp(**kw):
    HP = ref_loader.load_ref_module("super_gradients.training.utils.utils").HpmStruct
    return HP(**kw)


def test_resnet50_forward_parity():
    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.resnet")
    ref = m.ResNet50(_hp(), num_classes=7)
    mine = model_factory.get("resnet50", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=RESNET_RULES)


def test_resnet18_forward_parity():
    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.resnet")
    ref = m.ResNet18(_hp(), num_classes=7)
    mine = model_factory.get("resnet18", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=RESNET_RULES)
