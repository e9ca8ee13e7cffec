import jax
import jax.numpy as jnp
import numpy as np
import pytest

import super_gradients_tpu as sg
from super_gradients_tpu.parallel.spatial import halo_exchange, sharded_conv
from super_gradients_tpu.inference.sliding_window import (
    SlidingWindowInferenceDetectionWrapper,
    compute_tile_origins,
)


def test_tile_origins_cover_image():
    origins = compute_tile_origins((1000, 1500), (640, 640), (512, 512))
    ys = {y for y, x in origins}
    xs = {x for y, x in origins}
    assert max(ys) + 640 == 1000  # border tile clamped
    assert max(xs) + 640 >= 1500
    assert (0, 0) in origins


def test_sharded_conv_matches_unsharded():
    """Halo-exchange conv over an 8-way H-sharded image == plain SAME conv."""
    mesh = sg.setup_device(mesh_shape=(1, 8))  # use `model` axis with 8 devices
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 16, 3).astype(np.float32))  # H=64 -> 8 per shard
    k = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = sharded_conv(x, k, mesh, axis_name="model")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)
    # restore default mesh for later tests
    sg.setup_device(num_devices=8)


def test_sliding_window_finds_objects_outside_first_tile():
    """An 'object' far from the origin must be found through tiling + global merge."""
    model = sg.models.get("yolo_nas_s", num_classes=4, image_size=64)
    wrapper = SlidingWindowInferenceDetectionWrapper(
        model, tile_size=64, tile_step=48, tile_nms_conf=0.0, max_predictions=20, nms_mode="fast"
    )
    img = jnp.asarray(np.random.RandomState(0).rand(128, 160, 3).astype(np.float32))
    out = wrapper.predict_image_tensor(img)
    assert out.boxes.shape == (1, 20, 4)
    n = int(out.num_detections[0])
    assert n > 0
    boxes = np.asarray(out.boxes[0, :n])
    # global coordinates: some box must live beyond the first tile's extent
    assert boxes.max() > 64
    assert boxes[:, 0::2].max() <= 160 + 1e-3 and boxes[:, 1::2].max() <= 128 + 1e-3
