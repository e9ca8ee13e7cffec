import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu import models


def test_yolox_s_forward_and_predict():
    model = models.get("yolox_s", num_classes=80, image_size=320)
    out = model(jnp.ones((1, 320, 320, 3)))
    assert out.pred_bboxes.shape == (1, 2100, 4)
    assert out.pred_scores.shape == (1, 2100, 80)
    assert 6 < model.num_params() / 1e6 < 12  # YOLOX-S ≈ 9M
    img = (np.random.RandomState(0).rand(240, 320, 3) * 255).astype(np.uint8)
    preds = model.predict(img, conf=0.0, nms_top_k=128, max_predictions=10, nms_mode="fast", batch_size=1, fuse_model=False)
    assert len(preds) == 1


@pytest.mark.slow  # heavy e2e training — opt-in tier
def test_yolox_simota_loss_trains():
    from super_gradients_tpu.training.losses.yolox_loss import YoloXDetectionLoss

    model = models.get("yolox_n", num_classes=8, image_size=64)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    targets = np.full((2, 6, 5), -1.0, np.float32)
    targets[0, 0] = [1, 5, 5, 40, 40]
    targets[0, 1] = [3, 20, 30, 60, 60]
    targets[1, 0] = [0, 10, 10, 30, 50]
    loss_fn = YoloXDetectionLoss(num_classes=8)

    def f(params):
        variables = {"params": params, "batch_stats": model.batch_stats}
        out = model.module.apply(variables, x, train=False)
        total, aux = loss_fn(out, jnp.asarray(targets))
        return total, aux

    (val, aux), grads = jax.value_and_grad(f, has_aux=True)(model.params)
    assert np.isfinite(float(val))
    assert float(aux["num_fg"]) >= 2  # most gts matched (ties may drop one, as in reference SimOTA)
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gsum > 0 and np.isfinite(gsum)


def test_ssd_forward_and_loss():
    from super_gradients_tpu.models.detection.ssd import generate_ssd_anchors
    from super_gradients_tpu.training.losses.ssd_loss import SSDLoss

    model = models.get("ssd_lite_mobilenet_v2", num_classes=10, image_size=320)
    out = model(jnp.ones((1, 320, 320, 3)))
    n_anchors = out.pred_bboxes.shape[1]
    anchors = generate_ssd_anchors(320)
    assert n_anchors == len(anchors)
    assert out.pred_scores.shape == (1, n_anchors, 10)

    targets = np.full((1, 4, 5), -1.0, np.float32)
    targets[0, 0] = [2, 30, 30, 120, 150]
    loss_fn = SSDLoss(anchors)
    total, aux = loss_fn(out, jnp.asarray(targets))
    assert np.isfinite(float(total))
    assert float(aux["loc_loss"]) > 0 and float(aux["conf_loss"]) > 0
