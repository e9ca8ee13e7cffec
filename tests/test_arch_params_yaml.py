"""arch_params YAML groups: detectors reshapeable purely from config.

VERDICT r2 item #7 done-criterion: yolo_nas_s built from the arch_params YAML
must match the builder-constructed model param-for-param.
"""

import jax
import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.common.config import load_arch_params


def _shapes(tree):
    return [(path, tuple(np.shape(l))) for path, l in
            zip([jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(tree)[0]],
                jax.tree_util.tree_leaves(tree))]


@pytest.mark.parametrize("variant", ["yolo_nas_s", "yolo_nas_m"])
def test_yolo_nas_from_yaml_matches_builder(variant):
    ap = load_arch_params(f"{variant}_arch_params")
    assert "backbone" in ap and "neck" in ap and "heads" in ap
    from_yaml = models.get(variant, num_classes=80, arch_params=ap)
    from_builder = models.get(variant, num_classes=80)
    assert _shapes(from_yaml.variables) == _shapes(from_builder.variables)


def test_yolo_nas_yaml_reshape_changes_architecture():
    ap = load_arch_params("yolo_nas_s_arch_params")
    ap["backbone"]["NStageBackbone"]["stem"]["YoloNASStem"]["out_channels"] = 32
    ap["heads"]["NDFLHeads"]["heads_list"][0]["YoloNASDFLHead"]["inter_channels"] = 64
    reshaped = models.get("yolo_nas_s", num_classes=80, arch_params=ap)
    stock = models.get("yolo_nas_s", num_classes=80)
    assert _shapes(reshaped.variables) != _shapes(stock.variables)
    # and it still runs
    import jax.numpy as jnp

    out = reshaped.apply(jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert out.pred_scores.shape[-1] == 80


def test_ppyoloe_arch_params_yaml():
    ap = load_arch_params("ppyoloe_m_arch_params")
    m = models.get("ppyoloe_s", num_classes=5, arch_params=ap)  # arch params override the variant scale
    stock_m = models.get("ppyoloe_m", num_classes=5)
    assert _shapes(m.variables) == _shapes(stock_m.variables)


# ---------------- round-4 group-coverage additions (VERDICT r3 missing #3) ----


def _build_ok(name, ap, num_classes=None, hw=(64, 64)):
    import jax.numpy as jnp

    m = models.get(name, num_classes=num_classes, arch_params=ap)
    out = m.apply(jnp.zeros((1, hw[0], hw[1], 3), jnp.float32), train=False)
    return m, out


@pytest.mark.parametrize("variant", ["yolox_s", "yolox_m"])
def test_yolox_from_yaml_matches_builder(variant):
    ap = load_arch_params(f"{variant}_arch_params")
    assert ap["yolo_type"] == "yoloX" and "depth_mult_factor" in ap
    from_yaml = models.get(variant, num_classes=80, arch_params=ap)
    from_builder = models.get(variant, num_classes=80)
    assert _shapes(from_yaml.variables) == _shapes(from_builder.variables)


def test_yolox_yaml_reshape():
    ap = load_arch_params("yolox_s_arch_params")
    ap["width_mult_factor"] = 0.75  # yolox_m width on yolox_s depth
    reshaped = models.get("yolox_s", num_classes=80, arch_params=ap)
    stock = models.get("yolox_s", num_classes=80)
    assert _shapes(reshaped.variables) != _shapes(stock.variables)


@pytest.mark.parametrize("variant,yaml_name", [
    ("efficientnet_b0", "efficientnet_b0_arch_params"),
    ("efficientnet_b2", "efficientnet_b2_arch_params"),
    ("repvgg_a0", "repvgga0_arch_params"),
    ("repvgg_b0", "repvggb0_arch_params"),
    ("mobilenet_v3_large", "mobilenet_v3_large_arch_params"),
    ("mobilenet_v3_small", "mobilenet_v3_small_arch_params"),
    ("mobilenet_v2", "mobilenet_v2_arch_params"),
    ("resnet50", "resnet50_arch_params"),
    ("resnet18_cifar", "resnet18_cifar_arch_params"),
    ("vit_base", "vit_base_arch_params"),
])
def test_classifier_from_yaml_matches_builder(variant, yaml_name):
    ap = load_arch_params(yaml_name)
    from_yaml = models.get(variant, arch_params=ap)
    from_builder = models.get(variant)
    assert _shapes(from_yaml.variables) == _shapes(from_builder.variables)


def test_efficientnet_yaml_reshape():
    ap = load_arch_params("efficientnet_b0_arch_params")
    ap["width_coefficient"] = 1.4
    reshaped = models.get("efficientnet_b0", arch_params=ap)
    stock = models.get("efficientnet_b0")
    assert _shapes(reshaped.variables) != _shapes(stock.variables)


def test_repvgg_yaml_reshape():
    ap = load_arch_params("repvgga0_arch_params")
    ap["struct"] = [4, 6, 16, 1]
    ap["width_multiplier"] = [1, 1, 1, 2.5]
    reshaped = models.get("repvgg_a0", arch_params=ap)  # now shaped like b0
    b0 = models.get("repvgg_b0")
    assert _shapes(reshaped.variables) == _shapes(b0.variables)


def test_vit_yaml_reshape():
    ap = load_arch_params("vit_base_arch_params")
    ap["patch_size"] = [32, 32]
    reshaped = models.get("vit_base", arch_params=ap)
    stock = models.get("vit_base")
    assert _shapes(reshaped.variables) != _shapes(stock.variables)


@pytest.mark.parametrize("variant,yaml_name", [
    ("ssd_lite_mobilenet_v2", "ssd_lite_mobilenetv2_arch_params"),
    ("ssd_mobilenet_v1", "ssd_mobilenetv1_arch_params"),
])
def test_ssd_from_yaml_matches_builder(variant, yaml_name):
    ap = load_arch_params(yaml_name)
    from_yaml = models.get(variant, num_classes=80, arch_params=ap)
    from_builder = models.get(variant, num_classes=80)
    assert _shapes(from_yaml.variables) == _shapes(from_builder.variables)


def test_ssd_anchor_yaml_reshape():
    ap = load_arch_params("ssd_lite_mobilenetv2_arch_params")
    # fewer aspect ratios -> fewer anchors per level -> smaller head convs
    ap["heads"]["SSDHead"]["anchors"]["aspect_ratios"] = [[2], [2], [2], [2], [2], [2]]
    reshaped = models.get("ssd_lite_mobilenet_v2", num_classes=80, arch_params=ap)
    stock = models.get("ssd_lite_mobilenet_v2", num_classes=80)
    assert _shapes(reshaped.variables) != _shapes(stock.variables)


@pytest.mark.parametrize("variant", ["yolo_nas_pose_n", "yolo_nas_pose_s"])
def test_pose_from_yaml_matches_builder(variant):
    ap = load_arch_params(f"{variant}_arch_params")
    assert "backbone" in ap and "YoloNASPoseNDFLHeads" in ap["heads"]
    from_yaml = models.get(variant, arch_params=ap)
    from_builder = models.get(variant)
    assert _shapes(from_yaml.variables) == _shapes(from_builder.variables)


def test_dekr_from_yaml_matches_builder():
    ap = load_arch_params("pose_dekr_w32_no_dc_arch_params")
    from_yaml = models.get("dekr_w32_no_dc", arch_params=ap)
    from_builder = models.get("dekr_w32_no_dc")
    assert _shapes(from_yaml.variables) == _shapes(from_builder.variables)


def test_arch_params_defaults_merge():
    """Group-local `defaults:` includes resolve (repvgg_a0 builds on the shared
    repvgg schema like the reference's hydra group defaults)."""
    ap = load_arch_params("repvgga0_arch_params")
    assert ap["struct"] == [2, 4, 14, 1]
    assert ap["in_channels"] == 3  # inherited from repvgg_arch_params
    ap2 = load_arch_params("efficientnet_b3_arch_params")
    assert ap2["width_coefficient"] == 1.2 and ap2["drop_connect_rate"] == 0.2


def test_unet_from_yaml_builds():
    ap = load_arch_params("unet_default_arch_params")
    m, out = _build_ok("unet_custom", ap, num_classes=4)
    assert out.shape[-1] == 4
