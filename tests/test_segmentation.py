import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.training import dataloaders
from super_gradients_tpu.training.losses.segmentation_losses import (
    OhemCELoss,
    STDCLoss,
    SegCrossEntropyLoss,
    detail_target,
)
from super_gradients_tpu.training.metrics.segmentation import IoU, PixelAccuracy
from super_gradients_tpu.training.trainer import Trainer


@pytest.mark.parametrize("name,train_outs", [
    ("stdc1_seg", 4),
    ("pp_lite_t_seg", 1),
    ("ddrnet_23_slim", 1),
])
def test_seg_model_shapes(name, train_outs):
    model = models.get(name, num_classes=5, input_hw=(64, 64))
    x = jnp.ones((2, 64, 64, 3))
    out = model(x)  # eval mode: single map
    assert out.shape == (2, 64, 64, 5)
    out_t = model.apply(x, train=True)
    out_t = out_t[0] if isinstance(out_t, tuple) and not hasattr(out_t, "shape") else out_t
    main = out_t[0][0] if isinstance(out_t, tuple) and isinstance(out_t[0], tuple) else (
        out_t[0] if isinstance(out_t, tuple) else out_t
    )


def test_seg_losses_mask_ignore_index():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 4, (2, 16, 16)).astype(np.int32))
    targets_ign = targets.at[:, :8].set(255)

    l_full, _ = SegCrossEntropyLoss()(logits, targets)
    l_masked, _ = SegCrossEntropyLoss()(logits, targets_ign)
    assert np.isfinite(float(l_masked))
    # all-ignore gives 0, not NaN
    l_all_ign, _ = SegCrossEntropyLoss()(logits, jnp.full_like(targets, 255))
    assert float(l_all_ign) == 0.0

    l_ohem, _ = OhemCELoss()(logits, targets_ign)
    assert np.isfinite(float(l_ohem))
    # OHEM keeps hard pixels -> at least as large as plain mean CE
    assert float(l_ohem) >= float(l_masked) - 1e-5


def test_detail_target_edges():
    t = np.zeros((1, 32, 32), np.int32)
    t[0, :, 16:] = 1  # vertical edge at x=16
    dt = np.asarray(detail_target(jnp.asarray(t)))
    assert dt.shape == (1, 32, 32)
    assert dt[0, :, 15:17].mean() > 0.5  # edge region fires
    assert dt[0, :, :8].mean() < 0.1  # flat region doesn't


def test_stdc_loss_composite():
    model = models.get("stdc1_seg", num_classes=4, input_hw=(64, 64))
    x = jnp.ones((2, 64, 64, 3))
    outs = model.apply(x, train=True)
    if isinstance(outs, tuple) and len(outs) == 2:  # (outputs, mutated)
        outs = outs[0]
    targets = jnp.asarray(np.random.RandomState(0).randint(0, 4, (2, 64, 64)).astype(np.int32))
    loss, aux = STDCLoss(num_classes=4)(outs, targets)
    assert np.isfinite(float(loss))
    assert set(aux) == {"loss_main", "loss_aux", "loss_detail"}


def test_iou_metric_perfect_and_mixed():
    m = IoU(num_classes=3)
    state = m.init()
    t = jnp.asarray(np.random.RandomState(1).randint(0, 3, (2, 8, 8)).astype(np.int32))
    logits = jax.nn.one_hot(t, 3) * 10.0
    state = m.update(state, logits, t)
    assert m.compute(state)["IoU"] == pytest.approx(1.0)

    m2 = PixelAccuracy(num_classes=3)
    s2 = m2.update(m2.init(), logits, t)
    assert m2.compute(s2)["PixelAccuracy"] == pytest.approx(1.0)


@pytest.mark.slow  # heavy e2e training — opt-in tier
def test_segmentation_training_e2e(tmp_path):
    """Driver config 3 analogue: PP-LiteSeg/STDC Cityscapes-style training."""
    model = models.get("stdc1_seg", num_classes=4, input_hw=(64, 64))
    loader = dataloaders.DataLoader(
        dataloaders.RandomSegmentationDataset(num_samples=8, image_size=(64, 64), num_classes=4),
        batch_size=8,
    )
    trainer = Trainer("seg_e2e", ckpt_root_dir=str(tmp_path))
    params = dict(
        max_epochs=2,
        initial_lr=0.01,
        loss="STDCLoss",
        criterion_params={"num_classes": 4},
        valid_metrics_list=[{"IoU": {"num_classes": 4}}, {"PixelAccuracy": {"num_classes": 4}}],
        metric_to_watch="IoU",
        average_best_models=False,
    )
    trainer.train(model, params, loader, loader)
    assert len(trainer.valid_metrics_history) == 2
    assert "IoU" in trainer.valid_metrics_history[-1]
    assert all(np.isfinite(x) for x in trainer.train_loss_history)


def test_seg_predict_surface(tmp_path):
    model = models.get("pp_lite_t_seg", num_classes=4, input_hw=(64, 64))
    img = (np.random.RandomState(0).rand(100, 80, 3) * 255).astype(np.uint8)
    preds = model.predict(img)
    assert preds[0].segmentation_map.shape == (100, 80)
    drawn = preds[0].draw()
    assert drawn.shape == (100, 80, 3)


@pytest.mark.parametrize("name,size", [
    ("regseg48", 64),
    ("unet", 64),
    ("segformer_b0", 64),
])
def test_more_seg_models(name, size):
    model = models.get(name, num_classes=6, input_hw=(size, size))
    out = model(jnp.ones((1, size, size, 3)))
    assert out.shape == (1, size, size, 6)


@pytest.mark.parametrize("name", ["shelfnet18_lw", "laddernet_50"])
def test_shelfnet_laddernet(name):
    model = models.get(name, num_classes=6, input_hw=(64, 64))
    out = model(jnp.ones((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 6)


def test_shelfblock_weight_sharing():
    """The S-block's two conv applications must share ONE kernel (ref shelfnet.py:35)."""
    from super_gradients_tpu.models.segmentation.shelfnet_laddernet import ShelfBlock

    blk = ShelfBlock(8)
    vars_ = blk.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 8)))
    conv_params = [k for k in vars_["params"] if "conv" in k.lower()]
    assert len(conv_params) == 1  # a single shared kernel
