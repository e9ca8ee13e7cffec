import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu.ops.deform_conv import deform_conv2d


def test_zero_offsets_equal_regular_conv():
    """With zero offsets and no mask, deform_conv == standard SAME conv."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 10, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    offsets = jnp.zeros((2, 12, 10, 18))
    got = deform_conv2d(x, offsets, k)
    ref = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling():
    """Offset (0, +1) on every tap == conv over x shifted left by one column."""
    rng = np.random.RandomState(1)
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, :, :, 0] = rng.randn(8, 8)
    k = jnp.asarray(np.ones((1, 1, 1, 1), np.float32))
    offsets = jnp.zeros((1, 8, 8, 2)).at[..., 1].set(1.0)  # dx = +1
    got = np.asarray(deform_conv2d(jnp.asarray(x), offsets, k, padding=0))
    expected = np.zeros_like(x)
    expected[0, :, :-1, 0] = x[0, :, 1:, 0]
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_matches_torchvision_deform_conv():
    """Golden parity vs torchvision-equivalent torch implementation (CPU)."""
    torch = pytest.importorskip("torch")
    try:
        from torchvision.ops import deform_conv2d as tv_deform
    except ImportError:
        pytest.skip("torchvision unavailable")

    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 9, 9).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)
    off = (rng.randn(1, 18, 9, 9) * 0.5).astype(np.float32)
    ref = tv_deform(torch.from_numpy(x), torch.from_numpy(off), torch.from_numpy(w), padding=1).numpy()

    # torch offsets are interleaved (dy, dx) per tap, channel-first
    got = deform_conv2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(off.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref, rtol=1e-3, atol=1e-3)


def test_modulation_mask_scales_contribution():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    offsets = jnp.zeros((1, 6, 6, 18))
    full = deform_conv2d(x, offsets, k, mask=jnp.ones((1, 6, 6, 9)))
    half = deform_conv2d(x, offsets, k, mask=jnp.full((1, 6, 6, 9), 0.5))
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5, rtol=1e-4, atol=1e-5)
