import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu import models
from super_gradients_tpu.models.pose.dekr import dekr_decode


def test_dekr_forward_and_decode():
    model = models.get("dekr_w32_no_dc", num_classes=17, image_size=128, arch_params={"width": 16})
    out = model.apply(jnp.ones((1, 128, 128, 3)), train=False)
    assert out.heatmaps.shape == (1, 32, 32, 18)
    assert out.offsets.shape == (1, 32, 32, 34)

    poses, scores = dekr_decode(out, max_people=5)
    assert poses.shape == (1, 5, 17, 3)
    assert scores.shape == (1, 5)
    assert np.isfinite(np.asarray(poses)).all()
