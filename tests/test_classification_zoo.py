"""Smoke tests for the extended classification zoo: forward shapes + param counts."""

import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu import models

# (name, input size, rough expected params in millions (sanity band))
CASES = [
    ("mobilenet_v2", 96, (2.0, 5.0)),
    ("mobilenet_v3_large", 96, (3.0, 8.0)),
    ("mobilenet_v3_small", 96, (1.0, 4.0)),
    ("mobilenet_v1", 96, (3.0, 6.0)),
    ("efficientnet_b0", 96, (4.0, 7.0)),
    ("regnetY200", 96, (2.5, 5.0)),
    ("regnetY400", 96, (3.5, 7.5)),
    ("shufflenet_v2_x1_0", 96, (1.5, 4.0)),
    ("densenet121", 96, (6.0, 10.0)),
    ("resnext50", 96, (20.0, 30.0)),
    ("vgg16", 32, (10.0, 20.0)),
    ("lenet", 32, (0.01, 0.2)),
]


@pytest.mark.parametrize("name,size,band", CASES)
def test_classification_model_forward(name, size, band):
    model = models.get(name, num_classes=10, )
    x = jnp.ones((2, size, size, 3))
    out = model(x)
    assert out.shape == (2, 10)
    p = model.num_params() / 1e6
    lo, hi = band
    # fc layer shrinks with nc=10; only check the lower band loosely and upper strictly
    assert p < hi + 3, f"{name}: {p:.2f}M params out of band {band}"


def test_vit_forward():
    model = models.get("vit_base", num_classes=10)
    x = jnp.ones((1, 224, 224, 3))
    out = model(x)
    assert out.shape == (1, 10)
    assert 80 < model.num_params() / 1e6 < 90  # ViT-B/16 ~86M


@pytest.mark.parametrize("name,size", [
    ("repvgg_a0", 64),
    ("preact_resnet18", 32),
    ("googlenet_v1", 96),
    ("senet18", 32),
])
def test_more_classification_models(name, size):
    model = models.get(name, num_classes=7)
    out = model(jnp.ones((1, size, size, 3)))
    assert out.shape == (1, 7)


def test_repvgg_classification_fuse_parity():
    """Whole-RepVGG fusion (fuse_repvgg_params) matches the training graph."""
    import dataclasses

    import jax
    import numpy as np

    from super_gradients_tpu.models.classification.repvgg import REPVGG_VARIANTS, RepVGG
    from super_gradients_tpu.modules.blocks import RepVGGBlock, fuse_repvgg_params

    cfg = dataclasses.replace(REPVGG_VARIANTS["repvgg_a0"], num_classes=5)
    model = RepVGG(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(vars_, x, train=False)

    # fuse every RepVGG block subtree
    def walk(p, s, residual_ok):
        if "branch_3x3_conv" in p:
            k = p["branch_3x3_conv"]["kernel"]
            blk = RepVGGBlock(out_channels=int(k.shape[3]), use_residual="identity_bn" in p)
            return fuse_repvgg_params(p, s, blk)
        return {k2: walk(v, s.get(k2, {}), residual_ok) if isinstance(v, dict) else v for k2, v in p.items()}

    fused_params = walk(vars_["params"], vars_["batch_stats"], True)
    fused_model = RepVGG(dataclasses.replace(cfg, fused="full"))
    got = fused_model.apply({"params": fused_params}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name,size", [
    ("dpn26", 32),
    ("pnasnet", 32),
    ("beit_base_patch16_224", 224),
])
def test_last_classification_models(name, size):
    model = models.get(name, num_classes=5)
    out = model(jnp.ones((1, size, size, 3)))
    assert out.shape == (1, 5)
