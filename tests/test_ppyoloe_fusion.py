"""PPYoloE RepVGG fusion parity (regression: r2 verify drive found fuse_all_qarepvgg
mis-detected classic RepVGG blocks as QARepVGG — KeyError branch_1x1)."""

import numpy as np
import jax.numpy as jnp

from super_gradients_tpu import models


def test_ppyoloe_fuse_parity():
    m = models.get("ppyoloe_s", num_classes=8, image_size=64)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
    ref = m.module.apply(m.variables, x, train=False)
    fused = m.fuse()
    assert fused is not m
    got = fused.module.apply(fused.variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got.pred_bboxes), np.asarray(ref.pred_bboxes), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.pred_scores), np.asarray(ref.pred_scores), rtol=1e-3, atol=1e-4)
    # every RepVGG block collapsed to a single conv
    import jax

    flat = jax.tree_util.tree_leaves_with_path(fused.params)
    keys = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("rbr_reparam" in k for k in keys)
    assert not any("branch_1x1_conv" in k for k in keys)


def test_ppyoloe_predict_with_pretrained_processing():
    """End-to-end: faithful COCO processing params + fused predict program."""
    from super_gradients_tpu.inference.processing import get_pretrained_processing_params

    m = models.get("ppyoloe_s", num_classes=80, image_size=64)
    m.set_dataset_processing_params(**get_pretrained_processing_params("ppyoloe_s", "coco"))
    img = (np.random.RandomState(1).rand(50, 70, 3) * 255).astype(np.uint8)
    preds = m.predict(img)
    assert len(preds) == 1
