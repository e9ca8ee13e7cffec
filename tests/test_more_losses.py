"""Golden tests for BCEDice / ShelfNet / MSE / Rescoring losses vs torch math."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from super_gradients_tpu.training.losses.classification_losses import MSELoss, RescoringLoss
from super_gradients_tpu.training.losses.segmentation_losses import (
    BCEDiceLoss,
    ShelfNetOHEMLoss,
    ShelfNetSemanticEncodingLoss,
)


def test_mse_matches_torch():
    rng = np.random.RandomState(0)
    o, t = rng.randn(4, 10).astype(np.float32), rng.randn(4, 10).astype(np.float32)
    loss, _ = MSELoss()(jnp.asarray(o), jnp.asarray(t))
    ref = F.mse_loss(torch.from_numpy(o), torch.from_numpy(t)).item()
    assert float(loss) == pytest.approx(ref, rel=1e-5)


def test_rescoring_matches_torch_bce_with_logits():
    rng = np.random.RandomState(1)
    logits = rng.randn(8, 1).astype(np.float32)
    targets = rng.rand(8, 1).astype(np.float32)
    loss, _ = RescoringLoss()((jnp.zeros((8, 17, 3)), jnp.asarray(logits)), jnp.asarray(targets))
    ref = F.binary_cross_entropy_with_logits(torch.from_numpy(logits), torch.from_numpy(targets)).item()
    assert float(loss) == pytest.approx(ref, rel=1e-5)


def test_bce_dice_components():
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 16, 16, 1).astype(np.float32)
    targets = (rng.rand(2, 16, 16) > 0.5).astype(np.float32)
    loss, aux = BCEDiceLoss(loss_weights=(1.0, 0.0))(jnp.asarray(logits), jnp.asarray(targets))
    ref_bce = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits[..., 0]), torch.from_numpy(targets)
    ).item()
    assert float(loss) == pytest.approx(ref_bce, rel=1e-5)
    loss_d, aux_d = BCEDiceLoss(loss_weights=(0.0, 1.0))(jnp.asarray(logits), jnp.asarray(targets))
    assert 0.0 <= float(loss_d) <= 1.0  # dice loss bounded


def test_shelfnet_ohem_sums_heads():
    rng = np.random.RandomState(3)
    o1 = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    o2 = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    t = jnp.asarray(rng.randint(0, 4, (2, 8, 8)).astype(np.int32))
    crit = ShelfNetOHEMLoss(mining_percent=1.0)  # keep all pixels -> pure CE per head
    total, aux = crit((o1, o2), t)
    l1, _ = crit(o1, t)
    l2, _ = crit(o2, t)
    assert float(total) == pytest.approx(float(l1) + float(l2), rel=1e-5)


def test_shelfnet_se_loss_class_presence():
    rng = np.random.RandomState(4)
    nclass = 5
    pred = jnp.asarray(rng.randn(2, 8, 8, nclass).astype(np.float32))
    # image 0 contains only class 0; image 1 only class 3
    t = np.zeros((2, 8, 8), np.int32)
    t[1] = 3
    se_logits = np.full((2, nclass), -20.0, np.float32)  # predicts "absent" everywhere
    se_logits[0, 0] = 20.0  # correct presence for image 0
    se_logits[1, 3] = 20.0  # correct presence for image 1
    crit = ShelfNetSemanticEncodingLoss(nclass=nclass, se_weight=1.0, aux_weight=0.0)
    loss_good, aux = crit((pred, jnp.asarray(se_logits), pred), jnp.asarray(t))
    # flip presence predictions -> se term must grow
    loss_bad, aux_bad = crit((pred, jnp.asarray(-se_logits), pred), jnp.asarray(t))
    assert float(aux["se_bce"]) < 1e-3
    assert float(aux_bad["se_bce"]) > 1.0
    assert float(loss_bad) > float(loss_good)


def test_new_losses_registered():
    from super_gradients_tpu.common.registry import LOSSES

    for n in ("MSE", "RescoringLoss", "BCEDiceLoss", "ShelfNetOHEMLoss", "ShelfNetSemanticEncodingLoss"):
        assert n in LOSSES
