import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.modules.blocks import (
    ConvBNAct,
    ConvTranspose2x2,
    QARepVGGBlock,
    RepVGGBlock,
    fuse_qarepvgg_params,
    fuse_repvgg_params,
)


def _rand_stats(params_tree, rng):
    """Give BN running stats non-trivial values so fusion math is actually tested."""

    def visit(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if "mean" in v and "var" in v:
                    out[k] = {
                        "mean": jnp.asarray(rng.randn(*v["mean"].shape).astype(np.float32) * 0.3),
                        "var": jnp.asarray(np.abs(rng.randn(*v["var"].shape).astype(np.float32)) + 0.5),
                    }
                else:
                    out[k] = visit(v)
            else:
                out[k] = v
        return out

    return visit(params_tree)


def test_conv_bn_act_shapes():
    m = ConvBNAct(out_channels=16, kernel=3, stride=2)
    x = jnp.ones((2, 32, 32, 8))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (2, 16, 16, 16)


def test_qarepvgg_fuse_parity():
    rng = np.random.RandomState(0)
    cfg = dict(out_channels=8, act="relu", use_residual=True, use_alpha=True, bn_eps=1e-3)
    block = QARepVGGBlock(**cfg)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    vars_ = block.init(jax.random.PRNGKey(1), x)
    params = jax.device_get(vars_["params"])
    stats = _rand_stats(jax.device_get(vars_["batch_stats"]), rng)
    # randomize BN affine too
    params["branch_3x3_bn"] = {
        "scale": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(8).astype(np.float32) * 0.1),
    }
    params["post_bn"] = {
        "scale": jnp.asarray(rng.rand(8).astype(np.float32) + 0.5),
        "bias": jnp.asarray(rng.randn(8).astype(np.float32) * 0.1),
    }

    ref = block.apply({"params": params, "batch_stats": stats}, x, train=False)

    partial_p, partial_s, full_p = fuse_qarepvgg_params(params, stats, block)

    partial_block = QARepVGGBlock(**cfg, fused="partial")
    got_partial = partial_block.apply({"params": partial_p, "batch_stats": partial_s}, x, train=False)
    np.testing.assert_allclose(np.asarray(got_partial), np.asarray(ref), rtol=1e-4, atol=1e-4)

    full_block = QARepVGGBlock(**cfg, fused="full")
    got_full = full_block.apply({"params": full_p}, x, train=False)
    np.testing.assert_allclose(np.asarray(got_full), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_qarepvgg_fuse_parity_stride2_no_residual():
    rng = np.random.RandomState(3)
    cfg = dict(out_channels=12, stride=2, act="relu", use_residual=False, bn_eps=1e-3)
    block = QARepVGGBlock(**cfg)
    x = jnp.asarray(rng.randn(2, 16, 16, 6).astype(np.float32))
    vars_ = block.init(jax.random.PRNGKey(2), x)
    params = jax.device_get(vars_["params"])
    stats = _rand_stats(jax.device_get(vars_["batch_stats"]), rng)
    ref = block.apply({"params": params, "batch_stats": stats}, x, train=False)
    _, _, full_p = fuse_qarepvgg_params(params, stats, block)
    got = QARepVGGBlock(**cfg, fused="full").apply({"params": full_p}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_repvgg_fuse_parity():
    rng = np.random.RandomState(4)
    cfg = dict(out_channels=8, act="relu", use_residual=True)
    block = RepVGGBlock(**cfg)
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    vars_ = block.init(jax.random.PRNGKey(3), x)
    params = jax.device_get(vars_["params"])
    stats = _rand_stats(jax.device_get(vars_["batch_stats"]), rng)
    ref = block.apply({"params": params, "batch_stats": stats}, x, train=False)
    fused_p = fuse_repvgg_params(params, stats, block)
    got = RepVGGBlock(**cfg, fused="full").apply({"params": fused_p}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_conv_transpose_2x2_matches_torch():
    import torch

    rng = np.random.RandomState(5)
    x = rng.randn(2, 6, 5, 4).astype(np.float32)  # NHWC
    m = ConvTranspose2x2(out_channels=7)
    vars_ = m.init(jax.random.PRNGKey(4), jnp.asarray(x))
    kernel = np.asarray(vars_["params"]["kernel"])  # [2,2,in,out]
    bias = np.asarray(vars_["params"]["bias"])

    tm = torch.nn.ConvTranspose2d(4, 7, kernel_size=2, stride=2)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(kernel.transpose(2, 3, 0, 1)))  # [in,out,kh,kw]
        tm.bias.copy_(torch.from_numpy(bias))
    ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)

    got = np.asarray(m.apply(vars_, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
