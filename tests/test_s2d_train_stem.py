"""QARepVGGBlock s2d training fast path (modules/blocks.py):

The 3-channel stride-2 stem computes its two branches as ONE packed 2x2 conv
on the s2d(2x2) input. Must be numerically equal to the naive per-branch convs
(same params, same init RNG — the param tree is nn.Conv-compatible), and
gradients must flow back to the original [3,3,C,O]/[1,1,C,O] kernel layouts.

Ref anchor: modules/qarepvgg_block.py:10-330 (branch math); the layout trick is
the deploy-side s2d_stem_params (models/detection/yolo_nas.py:463) kept
in-graph and differentiable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu.modules.blocks import QARepVGGBlock


@pytest.fixture(autouse=True)
def _enable_s2d_train_stem(monkeypatch):
    """The packed path is opt-in (A/B on v5e: it loses ~5% in the train step —
    see modules/blocks.py); force it on here so parity stays tested."""
    monkeypatch.setenv("SG_TPU_S2D_STEM", "1")


def _stem_block(**kw):
    return QARepVGGBlock(
        out_channels=16, stride=2, use_residual=False, use_alpha=True,
        use_1x1_bias=True, use_post_bn=True, bn_eps=1e-3, bn_momentum=0.03, act="relu", **kw
    )


def _naive_forward(variables, x, bn_eps=1e-3):
    """Replicate the block math with plain stride-2 convs (eval mode)."""
    p = variables["params"]
    y3 = jax.lax.conv_general_dilated(
        x, p["branch_3x3_conv"]["kernel"], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    bn = p["branch_3x3_bn"]
    st = variables["batch_stats"]["branch_3x3_bn"]
    y3 = (y3 - st["mean"]) / jnp.sqrt(st["var"] + bn_eps) * bn["scale"] + bn["bias"]
    y1 = jax.lax.conv_general_dilated(
        x, p["branch_1x1"]["kernel"], (2, 2), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["branch_1x1"]["bias"]
    y1 = p["alpha"] * y1
    y = y3 + y1
    bn = p["post_bn"]
    st = variables["batch_stats"]["post_bn"]
    y = (y - st["mean"]) / jnp.sqrt(st["var"] + bn_eps) * bn["scale"] + bn["bias"]
    return jax.nn.relu(y)


def test_param_tree_matches_nn_conv_layout():
    block = _stem_block()
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x, train=False)
    params = variables["params"]
    assert params["branch_3x3_conv"]["kernel"].shape == (3, 3, 3, 16)
    assert "bias" not in params["branch_3x3_conv"]
    assert params["branch_1x1"]["kernel"].shape == (1, 1, 3, 16)
    assert params["branch_1x1"]["bias"].shape == (16,)
    assert set(params) == {"branch_3x3_conv", "branch_3x3_bn", "branch_1x1", "post_bn", "alpha"}


def test_fast_path_equals_naive_branch_math():
    block = _stem_block()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(1), x, train=False)
    # randomize BN stats/affine + alpha so equality exercises every term
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32) * 0.5 + 1.0), variables
    )
    out = block.apply(variables, x, train=False)
    expected = _naive_forward(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-5)


def test_fast_path_gradients_flow_to_original_layout():
    block = _stem_block()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(2), x, train=False)

    def loss(p):
        return jnp.sum(block.apply({"params": p, "batch_stats": variables["batch_stats"]}, x, train=False) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert g["branch_3x3_conv"]["kernel"].shape == (3, 3, 3, 16)
    assert float(jnp.abs(g["branch_3x3_conv"]["kernel"]).sum()) > 0
    assert float(jnp.abs(g["branch_1x1"]["kernel"]).sum()) > 0
    # grads vs the naive formula (same params -> same function -> same grads)
    def loss_naive(p):
        return jnp.sum(_naive_forward({"params": p, "batch_stats": variables["batch_stats"]}, x) ** 2)

    gn = jax.grad(loss_naive)(variables["params"])
    for a, b in [(g["branch_3x3_conv"]["kernel"], gn["branch_3x3_conv"]["kernel"]),
                 (g["branch_1x1"]["kernel"], gn["branch_1x1"]["kernel"]),
                 (g["branch_1x1"]["bias"], gn["branch_1x1"]["bias"])]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_wide_input_keeps_naive_path():
    """Blocks with MXU-friendly channel counts must NOT take the s2d path
    (identical params, but no reason to transform)."""
    block = QARepVGGBlock(out_channels=32, stride=2, use_residual=False,
                          bn_eps=1e-5, bn_momentum=0.1, act="relu")
    x = jnp.zeros((1, 16, 16, 48), jnp.float32)
    variables = block.init(jax.random.PRNGKey(3), x, train=False)
    assert variables["params"]["branch_3x3_conv"]["kernel"].shape == (3, 3, 48, 32)
    out = block.apply(variables, x, train=False)
    assert out.shape == (1, 8, 8, 32)


def test_train_mode_batch_stats_update_matches():
    """BN batch stats in train mode are computed from the branch outputs —
    identical through the packed path."""
    block = _stem_block()
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 16, 16, 3).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(4), x, train=False)
    _, mut = block.apply(variables, x, train=True, mutable=["batch_stats"])
    # naive y3 mean over (B,H,W) must equal the updated running-mean direction
    p = variables["params"]
    y3 = jax.lax.conv_general_dilated(
        x, p["branch_3x3_conv"]["kernel"], (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    batch_mean = np.asarray(y3.mean(axis=(0, 1, 2)))
    new_running = np.asarray(mut["batch_stats"]["branch_3x3_bn"]["mean"])
    # running = (1-m)*old + m*batch with old=0 -> proportional to batch mean
    np.testing.assert_allclose(new_running, 0.03 * batch_mean, rtol=1e-4, atol=1e-5)
