import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu import models


def test_yolo_nas_full_model_fusion_parity():
    """Fused (deploy) YOLO-NAS-S must produce the same outputs as the training form."""
    model = models.get("yolo_nas_s", num_classes=8, image_size=64)

    # make BN stats non-trivial so fusion math is actually exercised
    rng = np.random.RandomState(0)

    def jitter_stats(t):
        def f(x):
            a = np.asarray(x)
            return jnp.asarray(a + rng.randn(*a.shape).astype(a.dtype) * 0.05 + (0.5 if "var" else 0))

        return jax.tree_util.tree_map(f, t)

    vars_ = dict(model.variables)
    vars_["batch_stats"] = jitter_stats(vars_["batch_stats"])
    model.update_variables(vars_)

    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ref = model.module.apply(model.variables, x, train=False)

    fused = model.fuse()
    got = fused.module.apply(fused.variables, x, train=False)

    np.testing.assert_allclose(np.asarray(got.pred_bboxes), np.asarray(ref.pred_bboxes), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.pred_scores), np.asarray(ref.pred_scores), rtol=1e-3, atol=1e-4)
    # fused model has fewer params (branches collapsed)
    assert fused.num_params() < model.num_params()
    # fusing an already-fused model is a no-op
    assert fused.fuse() is fused
