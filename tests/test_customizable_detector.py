"""String-factory detector composition tests (ref customizable_detector.py +
detection_modules.py: recipes assemble detectors from registered module names)."""

import jax
import jax.numpy as jnp
import pytest

from super_gradients_tpu.models.detection.customizable_detector import (
    CustomizableDetector,
    build_detection_module,
    parse_module_spec,
)


def test_parse_module_spec_forms():
    assert parse_module_spec("NDFLHeads") == ("NDFLHeads", {})
    assert parse_module_spec(("NDFLHeads", {"num_classes": 3})) == ("NDFLHeads", {"num_classes": 3})
    assert parse_module_spec({"NDFLHeads": {"num_classes": 3}}) == ("NDFLHeads", {"num_classes": 3})
    with pytest.raises(ValueError):
        parse_module_spec({"A": {}, "B": {}})


def test_unknown_module_lists_choices():
    with pytest.raises(KeyError, match="NStageBackbone"):
        build_detection_module("NoSuchModule")


def test_customizable_detector_from_yaml_style_spec():
    """Tiny YOLO-NAS assembled purely from registered names + params
    (the reference arch-params YAML form)."""
    det = CustomizableDetector(
        backbone={
            "NStageBackbone": {
                "stem_channels": 16,
                "stages": [
                    {"out_channels": 32, "num_blocks": 1, "hidden_channels": 16},
                    {"out_channels": 64, "num_blocks": 1, "hidden_channels": 16},
                    {"out_channels": 128, "num_blocks": 1, "hidden_channels": 32},
                    {"out_channels": 256, "num_blocks": 1, "hidden_channels": 64},
                ],
                "spp_channels": 256,
                "spp_k": [5, 9, 13],
            }
        },
        neck={
            "YoloNASPANNeckWithC2": {
                "neck1": {"out_channels": 64, "num_blocks": 1, "hidden_channels": 24},
                "neck2": {"out_channels": 32, "num_blocks": 1, "hidden_channels": 16},
                "neck3": {"out_channels": 64, "num_blocks": 1, "hidden_channels": 24},
                "neck4": {"out_channels": 128, "num_blocks": 1, "hidden_channels": 24},
            }
        },
        heads={
            "NDFLHeads": {
                "heads": [
                    {"inter_channels": 32, "width_mult": 0.5, "stride": 8},
                    {"inter_channels": 64, "width_mult": 0.5, "stride": 16},
                    {"inter_channels": 128, "width_mult": 0.5, "stride": 32},
                ],
                "reg_max": 8,
            }
        },
        num_classes=7,
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), x)
    out = det.apply(variables, x, train=False)
    n_anchors = 8 * 8 + 4 * 4 + 2 * 2  # strides 8/16/32 on 64px input
    assert out.pred_scores.shape == (1, n_anchors, 7)
    assert out.pred_bboxes.shape == (1, n_anchors, 4)


def test_builders_registered():
    from super_gradients_tpu.common.registry import DETECTION_MODULES

    for name in ("NStageBackbone", "YoloNASPANNeckWithC2", "NDFLHeads",
                 "CSPResNetBackbone", "PPYoloECSPPAN"):
        assert name in DETECTION_MODULES
