"""Full-model forward-parity goldens: classification families vs the ACTUAL reference
code (classification_models/*.py loaded standalone via ref_loader)."""

import pytest

pytestmark = pytest.mark.parity

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


def test_repvgg_a0_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import REPVGG_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.repvgg")
    ref = m.RepVggA0(_hp(num_classes=7, build_residual_branches=True))
    mine = model_factory.get("repvgg_a0", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=REPVGG_RULES)


def test_densenet121_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import DENSENET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.densenet")
    ref = m.DenseNet121(_hp(num_classes=7))
    mine = model_factory.get("densenet121", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=DENSENET_RULES)


def test_regnetY200_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import REGNET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.regnet")
    ref = m.RegNetY200(_hp(num_classes=7))
    mine = model_factory.get("regnetY200", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=REGNET_RULES)


def test_mobilenet_v2_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import MOBILENET_V2_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.mobilenetv2")
    ref = m.MobileNetV2Base(_hp(num_classes=7))
    mine = model_factory.get("mobilenet_v2", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=MOBILENET_V2_RULES)


def test_mobilenet_v3_large_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import MOBILENET_V3_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.mobilenetv3")
    ref = m.mobilenetv3_large(_hp(num_classes=7))
    mine = model_factory.get("mobilenet_v3_large", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=MOBILENET_V3_RULES)


def test_efficientnet_b0_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import EFFICIENTNET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.efficientnet")
    ref = m.EfficientNetB0(_hp(num_classes=7))
    mine = model_factory.get("efficientnet_b0", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=EFFICIENTNET_RULES)


def test_beit_base_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import BEIT_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.beit")
    ref = m.BeitBasePatch16_224(_hp(num_classes=7, image_size=(224, 224)))
    mine = model_factory.get("beit_base_patch16_224", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(224, 224), rules=BEIT_RULES)


def test_vit_base_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import VIT_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.vit")
    ref = m.ViTBase(_hp(num_classes=7, image_size=(224, 224)))
    mine = model_factory.get("vit_base", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(224, 224), rules=VIT_RULES)


def test_vgg16_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import vgg_key_mapper
    from super_gradients_tpu.models.classification.misc_models import VGG_CFGS

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.vgg")
    ref = m.VGG("VGG16")
    mine = model_factory.get("vgg16", num_classes=10)
    parity_utils.classification_parity(ref, mine, input_hw=(32, 32),
                                       rules=vgg_key_mapper(VGG_CFGS["vgg16"])())


def test_shufflenet_v2_x1_0_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import SHUFFLENET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.shufflenetv2")
    ref = m.ShufflenetV2_x1_0(_hp(num_classes=7), num_classes=7)
    mine = model_factory.get("shufflenet_v2_x1_0", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=SHUFFLENET_RULES)


def test_googlenet_v1_forward_parity():
    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.googlenet")
    ref = m.GoogleNetV1(_hp(num_classes=7, dropout=0.2))
    mine = model_factory.get("googlenet_v1", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(224, 224), rules=())


def test_senet18_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import SENET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.senet")
    ref = m.SENet(m.PreActBlock, [2, 2, 2, 2], num_classes=7)
    mine = model_factory.get("senet18", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(32, 32), rules=SENET_RULES)


def test_preact_resnet18_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import PREACT_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.preact_resnet")
    ref = m.PreActResNet(m.PreActBlock, [2, 2, 2, 2], num_classes=7)
    mine = model_factory.get("preact_resnet18", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(32, 32), rules=PREACT_RULES)


def test_resnext50_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import RESNEXT_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.resnext")
    ref = m.ResNeXt(layers=[3, 4, 6, 3], cardinality=32, bottleneck_width=4, num_classes=7)
    mine = model_factory.get("resnext50", num_classes=7)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=RESNEXT_RULES)


def test_dpn26_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import DPN_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.dpn")
    ref = m.DPN26()
    mine = model_factory.get("dpn26", num_classes=10)
    parity_utils.classification_parity(ref, mine, input_hw=(32, 32), rules=DPN_RULES)


def test_mobilenet_v1_backbone_forward_parity():
    """The reference MobileNet classifier head is broken upstream
    (mobilenet.py:41: nn.Linear(self.cfg[-1], ...) where cfg[-1] is the tuple
    (1024, 2)) and it is never registered as a standalone classifier — only
    consumed in backbone_mode by SSD (detection_modules.py:222). Pin the
    breakage and golden the backbone features instead."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    import torch

    from super_gradients_tpu.conversion.torch_converter import MOBILENET_V1_RULES
    from super_gradients_tpu.models.classification.mobilenet import MobileNetV1

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.mobilenet")
    with pytest.raises(TypeError):
        m.MobileNet(num_classes=10)

    ref = parity_utils.randomize_reference(m.MobileNet(backbone_mode=True), input_hw=(64, 64))
    mine = parity_utils.bare_module(MobileNetV1(backbone_mode=True), input_hw=(64, 64))
    parity_utils.convert_into(ref, mine, MOBILENET_V1_RULES)
    x = (np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32) - 0.5)
    with torch.no_grad():
        ref_out = ref(parity_utils.to_nchw(x)).numpy()
    got = np.asarray(mine.apply(jnp.asarray(x), train=False)).transpose(0, 3, 1, 2)
    parity_utils.assert_close(got, ref_out)


def test_stdc1_classification_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import STDC_CLS_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.stdc")
    ref = m.STDC1Classification(_hp(num_classes=10))
    mine = model_factory.get("stdc1_classification", num_classes=10)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=STDC_CLS_RULES)


def test_stdc2_classification_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import STDC_CLS_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.stdc")
    ref = m.STDC2Classification(_hp(num_classes=10))
    mine = model_factory.get("stdc2_classification", num_classes=10)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=STDC_CLS_RULES)


def test_darknet53_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import DARKNET53_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.darknet53")
    ref = m.Darknet53(backbone_mode=False, num_classes=10)
    mine = model_factory.get("darknet53", num_classes=10)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=DARKNET53_RULES)


def test_csp_darknet53_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import CSP_DARKNET53_CLS_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.detection_models.csp_darknet53")
    HP = ref_loader.load_ref_module("super_gradients.training.utils.utils").HpmStruct
    ref = m.CSPDarknet53(HP(num_classes=10, backbone_mode=False))
    mine = model_factory.get("csp_darknet53", num_classes=10)
    parity_utils.classification_parity(ref, mine, input_hw=(64, 64), rules=CSP_DARKNET53_CLS_RULES)


def test_pnasnet_a_forward_parity():
    """PNASNetA is shipped but unregistered upstream (pnasnet.py:115); its head is
    a fixed Linear(4p, 10), i.e. CIFAR-only — golden at 32x32."""
    from super_gradients_tpu.conversion.torch_converter import PNASNET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.classification_models.pnasnet")
    ref = m.PNASNetA()
    mine = model_factory.get("pnasnet", num_classes=10)
    parity_utils.classification_parity(ref, mine, input_hw=(32, 32), rules=PNASNET_RULES)
