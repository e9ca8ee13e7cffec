import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu import models


def test_ppyoloe_s_forward_and_predict():
    model = models.get("ppyoloe_s", num_classes=80, image_size=320)
    out = model(jnp.ones((1, 320, 320, 3)))
    assert out.pred_bboxes.shape == (1, 2100, 4)  # 40²+20²+10²
    assert out.pred_scores.shape == (1, 2100, 80)
    # ~7.5M params at w0.5/d0.33 (reference PP-YOLOE-S ≈ 7.9M)
    assert 5 < model.num_params() / 1e6 < 11

    img = (np.random.RandomState(0).rand(200, 320, 3) * 255).astype(np.uint8)
    preds = model.predict(img, conf=0.0, nms_top_k=128, max_predictions=10, nms_mode="fast", batch_size=1, fuse_model=False)
    assert len(preds) == 1


@pytest.mark.slow  # heavy e2e training — opt-in tier
def test_ppyoloe_trains_with_ppyolo_loss(tmp_path):
    from super_gradients_tpu.training import dataloaders
    from super_gradients_tpu.training.trainer import Trainer

    model = models.get("ppyoloe_s", num_classes=8, image_size=64)
    loader = dataloaders.DataLoader(
        dataloaders.RandomDetectionDataset(num_samples=8, image_size=(64, 64), num_classes=8, max_boxes=8),
        batch_size=8,
    )
    trainer = Trainer("ppyoloe_e2e", ckpt_root_dir=str(tmp_path))
    trainer.train(
        model,
        dict(max_epochs=1, initial_lr=1e-4, loss="PPYoloELoss", criterion_params={"num_classes": 8},
             valid_metrics_list=[], metric_to_watch="Loss", greater_metric_to_watch_is_better=False,
             save_model=False, average_best_models=False),
        loader,
        valid_loader=None,
    )
    assert np.isfinite(trainer.train_loss_history[0])
