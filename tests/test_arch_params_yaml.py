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
