"""Full-model forward-parity goldens: segmentation families vs the ACTUAL reference
code (segmentation_models/*.py loaded standalone via ref_loader)."""

import pytest

pytestmark = pytest.mark.parity

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


def test_shelfnet18_lw_forward_parity():
    """All three NetOutput heads (ref shelfnet.py:573-607, auxilary_head_outputs=True)."""
    import jax.numpy as jnp
    import numpy as np
    import torch

    from super_gradients_tpu.conversion.torch_converter import SHELFNET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.shelfnet")
    ref = parity_utils.randomize_reference(m.ShelfNet18_LW(arch_params=_hp(num_classes=7)), input_hw=(128, 256))
    mine = model_factory.get("shelfnet18_lw", num_classes=7, input_hw=(128, 256), arch_params={"aux_outputs": True})
    parity_utils.convert_into(ref, mine, SHELFNET_RULES)

    x = (np.random.RandomState(0).rand(1, 128, 256, 3).astype(np.float32) - 0.5)
    with torch.no_grad():
        ref_outs = ref(parity_utils.to_nchw(x))
    got_outs = mine.apply(jnp.asarray(x), train=False)
    assert len(ref_outs) == len(got_outs) == 3
    for i, (g, r) in enumerate(zip(got_outs, ref_outs)):
        parity_utils.assert_close(np.asarray(g).transpose(0, 3, 1, 2), r.numpy(), name=f"head{i}")


def test_shelfnet34_lw_forward_parity():
    from super_gradients_tpu.conversion.torch_converter import SHELFNET_RULES

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.shelfnet")
    ref = m.ShelfNet34_LW(arch_params=_hp(num_classes=7))
    mine = model_factory.get("shelfnet34_lw", num_classes=7, input_hw=(128, 256))
    parity_utils.segmentation_parity(ref, mine, input_hw=(128, 256), rules=SHELFNET_RULES)


def test_shelfnet50_reference_is_broken_ours_works():
    """No forward golden is POSSIBLE for the HW variants: the reference's
    ShelfResNetBackBone (shelfnet.py:82) never passes ``expansion=4`` to ResNet,
    so ``_make_layer`` (resnet.py:179-193) tracks ``in_planes`` with expansion 1
    while Bottleneck outputs 4x — ShelfNet50/101/50_3343 crash on any forward
    upstream. This test pins that fact and checks our as-intended HW assembly
    (main + SE-linear + FCNHead aux) runs."""
    import jax.numpy as jnp
    import numpy as np
    import pytest
    import torch

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.shelfnet")
    ref = m.ShelfNet50(arch_params=_hp(num_classes=7))
    ref.eval()
    with pytest.raises(RuntimeError, match="expected input"):
        with torch.no_grad():
            ref(torch.randn(1, 3, 128, 256))

    mine = model_factory.get("shelfnet50", num_classes=7, input_hw=(128, 256), arch_params={"aux_outputs": True})
    outs = mine.apply(jnp.asarray(np.zeros((1, 128, 256, 3), np.float32)), train=False)
    assert len(outs) == 3 and outs[0].shape == (1, 128, 256, 7) and outs[1].shape == (1, 7)


def test_unet_forward_parity():
    """Classic UNET assembly (unet_arch_params.yaml: ConvStage encoder +
    UpCatBlock decoder + SegmentationHead)."""
    from super_gradients_tpu.conversion.torch_converter import unet_key_mapper

    m = ref_loader.load_ref_module("super_gradients.training.models.segmentation_models.unet.unet")
    ref = m.UNet(_hp(num_classes=7))
    mine = model_factory.get("unet", num_classes=7, input_hw=(128, 128))
    parity_utils.segmentation_parity(ref, mine, input_hw=(128, 128), rules=unet_key_mapper(mine.config))
