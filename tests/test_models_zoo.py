import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu import models


def test_list_models_contains_core():
    names = models.list_models()
    for n in ["resnet18", "resnet50", "yolo_nas_s", "yolo_nas_m", "yolo_nas_l"]:
        assert n in names


def test_unknown_model_errors_with_hint():
    with pytest.raises(KeyError) as ei:
        models.get("resnet18_typo_xyz")
    assert "resnet18" in str(ei.value)


def test_resnet18_get_and_predict():
    model = models.get("resnet18", num_classes=10)
    assert model.task == "classification"
    assert model.num_params() > 1e6
    img = (np.random.RandomState(0).rand(100, 120, 3) * 255).astype(np.uint8)
    preds = model.predict([img, img], top_k=3)
    assert len(preds) == 2
    assert preds[0].labels.shape == (3,)
    assert preds[0].confidence.shape == (3,)
    assert 0 <= preds[0].prediction < 10


def test_resnet_replace_num_classes():
    model = models.get("resnet18", num_classes=7)
    x = jnp.ones((2, 64, 64, 3))
    out = model(x)
    assert out.shape == (2, 7)


def test_yolo_nas_s_predict_end_to_end():
    model = models.get("yolo_nas_s", num_classes=80, arch_params={}, image_size=320)
    assert model.task == "detection"
    img = (np.random.RandomState(1).rand(240, 320, 3) * 255).astype(np.uint8)
    preds = model.predict(img, conf=0.0, max_predictions=20, nms_top_k=128, batch_size=1, nms_mode="fast")
    assert len(preds) == 1
    p = preds[0]
    assert p.bboxes_xyxy.shape[1] == 4
    # boxes must be inside the original image after postprocess
    if len(p) > 0:
        assert p.bboxes_xyxy[:, 0::2].max() <= 320 + 1e-3
        assert p.bboxes_xyxy[:, 1::2].max() <= 240 + 1e-3
    # draw/save surface works
    drawn = p.draw()
    assert drawn.shape == img.shape


def test_yolo_nas_predict_batch_tensor_fused():
    model = models.get("yolo_nas_s", num_classes=80, image_size=320)
    x = jnp.zeros((2, 320, 320, 3))
    out = model.predict_batch_tensor(x, conf=0.1, nms_mode="fast")
    assert out.boxes.shape == (2, 300, 4)
    assert out.num_detections.shape == (2,)
