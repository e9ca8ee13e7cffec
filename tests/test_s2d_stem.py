"""Space-to-depth stem deploy transform: bit-equivalence with the fused baseline
(s2d_stem_params, yolo_nas.py — the MXU-lane-filling stem used by bench.py)."""

import numpy as np
import jax.numpy as jnp

from super_gradients_tpu import models


def test_s2d_stem_parity_and_input_scale_fold():
    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    m0, v0 = model._infer_module_and_vars(fuse_model=True, bf16=False)
    m1, v1 = model._infer_module_and_vars(fuse_model=True, bf16=False, stem_s2d=True, input_scale=1 / 255.0)

    x = np.random.RandomState(0).randint(0, 255, size=(2, 64, 64, 3)).astype(np.float32)
    o0 = m0.apply(v0, jnp.asarray(x / 255.0), train=False)
    o1 = m1.apply(v1, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(o0.pred_bboxes), np.asarray(o1.pred_bboxes), atol=2e-2)
    np.testing.assert_allclose(np.asarray(o0.pred_scores), np.asarray(o1.pred_scores), atol=1e-4)


def test_s2d_requires_fused_config():
    import pytest

    model = models.get("yolo_nas_s", num_classes=8, image_size=64)
    from super_gradients_tpu.models.detection.yolo_nas import s2d_stem_params

    with pytest.raises(ValueError):
        s2d_stem_params(model.params)  # unfused stem has no rbr_reparam
