import pytest
import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu import models
from super_gradients_tpu.models.pose.dekr import dekr_decode


@pytest.mark.heavy  # compile-heavy; nightly tier
def test_dekr_forward_and_decode():
    model = models.get("dekr_w32_no_dc", num_classes=17, image_size=128, arch_params={"width": 16})
    out = model.apply(jnp.ones((1, 128, 128, 3)), train=False)
    assert out.heatmaps.shape == (1, 32, 32, 18)
    assert out.offsets.shape == (1, 32, 32, 34)

    poses, scores = dekr_decode(out, max_people=5)
    assert poses.shape == (1, 5, 17, 3)
    assert scores.shape == (1, 5)
    assert np.isfinite(np.asarray(poses)).all()


def test_dekr_loss():
    from super_gradients_tpu.training.losses.dekr_loss import DEKRLoss
    from super_gradients_tpu.models.pose.dekr import DEKROutputs

    rng = np.random.RandomState(0)
    h = w = 16
    k = 4
    out = DEKROutputs(
        heatmaps=jnp.asarray(rng.randn(2, h, w, 1 + k).astype(np.float32)),
        offsets=jnp.asarray(rng.randn(2, h, w, 2 * k).astype(np.float32)),
    )
    targets = (
        jnp.asarray(rng.rand(2, h, w, 1 + k).astype(np.float32)),
        jnp.ones((2, h, w, 1 + k)),
        jnp.asarray(rng.randn(2, h, w, 2 * k).astype(np.float32)),
        jnp.asarray((rng.rand(2, h, w, 2 * k) > 0.5).astype(np.float32)),
    )
    loss, aux = DEKRLoss()(out, targets)
    assert np.isfinite(float(loss))
    assert float(aux["heatmap_loss"]) > 0 and float(aux["offset_loss"]) > 0
