"""Golden parity: OhemCELoss vs the reference torch implementation
(ohem_ce_loss.py loaded standalone with stubbed super_gradients exception deps)."""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from super_gradients_tpu.training.losses.segmentation_losses import OhemCELoss


def _load_reference_ohem():
    exc_mod = types.ModuleType("super_gradients.common.exceptions.loss_exceptions")

    class _E(Exception):
        def __init__(self, *a, **k):
            super().__init__(str(a))

    exc_mod.IllegalRangeForLossAttributeException = _E
    exc_mod.RequiredLossComponentReductionException = _E
    for name in ["super_gradients", "super_gradients.common", "super_gradients.common.exceptions"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["super_gradients.common.exceptions.loss_exceptions"] = exc_mod

    spec = importlib.util.spec_from_file_location(
        "ref_ohem", "/root/reference/src/super_gradients/training/losses/ohem_ce_loss.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_REF_CACHE = []


def REF_mod():
    """Lazy: collection-time sys.modules writes would break ref_loader's hollow
    packages for every parity test in the shared pytest process."""
    if not _REF_CACHE:
        _REF_CACHE.append(_load_reference_ohem())
    return _REF_CACHE[0]


@pytest.mark.parametrize("mining_percent,threshold", [(0.1, 0.7), (0.5, 0.7), (0.25, 0.9)])
def test_ohem_ce_matches_reference(mining_percent, threshold):
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 12, 16, 5).astype(np.float32) * 3
    targets = rng.randint(0, 5, (2, 12, 16)).astype(np.int64)
    targets[0, :3] = 255  # ignore region

    ref_loss = REF_mod().OhemCELoss(threshold=threshold, mining_percent=mining_percent, ignore_lb=255)(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)), torch.from_numpy(targets)
    )
    ours, _ = OhemCELoss(threshold=threshold, mining_percent=mining_percent, ignore_lb=255)(
        jnp.asarray(logits), jnp.asarray(targets.astype(np.int32))
    )
    assert float(ours) == pytest.approx(float(ref_loss), rel=2e-5)


def test_ohem_all_ignored_is_zero():
    logits = jnp.zeros((1, 4, 4, 3))
    targets = jnp.full((1, 4, 4), 255, jnp.int32)
    loss, _ = OhemCELoss()(logits, targets)
    assert float(loss) == 0.0


def test_ohem_rejects_bad_mining_percent():
    with pytest.raises(ValueError):
        OhemCELoss(mining_percent=1.5)
