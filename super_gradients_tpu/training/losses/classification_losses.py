"""Classification losses (reference ``training/losses/label_smoothing_cross_entropy_loss.py``,
``focal_loss.py``). Losses are callables: ``loss(outputs, targets) -> (loss, aux)``
where ``aux`` is a dict of scalar components for logging.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from super_gradients_tpu.common.registry import register_loss


@register_loss("CrossEntropyLoss")
class CrossEntropyLoss:
    def __init__(self, label_smoothing: float = 0.0, smooth_eps: float = None):
        # the reference spells label smoothing `smooth_eps`
        # (label_smoothing_cross_entropy_loss.py:90); accept both
        self.label_smoothing = label_smoothing if smooth_eps is None else smooth_eps

    def __call__(self, outputs: jnp.ndarray, targets: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        num_classes = outputs.shape[-1]
        if targets.ndim == outputs.ndim - 1:  # int labels
            onehot = jax.nn.one_hot(targets, num_classes)
        else:
            onehot = targets
        if self.label_smoothing:
            onehot = optax.smooth_labels(onehot, self.label_smoothing)
        loss = optax.softmax_cross_entropy(outputs, onehot).mean()
        return loss, {"CrossEntropyLoss": loss}


@register_loss("LabelSmoothingCrossEntropyLoss")
class LabelSmoothingCrossEntropyLoss(CrossEntropyLoss):
    def __init__(self, smooth_eps: float = 0.1, **kw):
        super().__init__(label_smoothing=smooth_eps)


@register_loss("FocalLoss")
class FocalLoss:
    """Binary focal loss over one-hot targets (ref ``losses/focal_loss.py``)."""

    def __init__(self, alpha: float = 0.25, gamma: float = 2.0):
        self.alpha, self.gamma = alpha, gamma

    def __call__(self, outputs: jnp.ndarray, targets: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        num_classes = outputs.shape[-1]
        onehot = jax.nn.one_hot(targets, num_classes) if targets.ndim == outputs.ndim - 1 else targets
        p = jax.nn.sigmoid(outputs)
        ce = optax.sigmoid_binary_cross_entropy(outputs, onehot)
        p_t = p * onehot + (1 - p) * (1 - onehot)
        alpha_t = self.alpha * onehot + (1 - self.alpha) * (1 - onehot)
        loss = (alpha_t * (1 - p_t) ** self.gamma * ce).sum(-1).mean()
        return loss, {"FocalLoss": loss}


@register_loss("MSE")
class MSELoss:
    """Mean squared error (ref all_losses Losses.MSE → torch.nn.MSELoss)."""

    def __call__(self, outputs: jnp.ndarray, targets: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        loss = jnp.mean((outputs - targets.reshape(outputs.shape)) ** 2)
        return loss, {"MSE": loss}


@register_loss("RescoringLoss")
class RescoringLoss:
    """BCE-with-logits between predicted pose-rescoring scores and target OKS
    (ref rescoring_loss.py:11-22). ``outputs`` is ``(poses, score_logits)``."""

    def __call__(self, outputs, targets) -> Tuple[jnp.ndarray, Dict]:
        logits = outputs[1] if isinstance(outputs, (tuple, list)) else outputs
        z = logits.astype(jnp.float32)
        t = targets.reshape(z.shape).astype(jnp.float32)
        loss = (jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))).mean()
        return loss, {"RescoringLoss": loss}


@register_loss("RSquaredLoss")
class RSquaredLoss:
    """1 - R² regression loss (ref losses/r_squared_loss.py)."""

    def __call__(self, outputs: jnp.ndarray, targets: jnp.ndarray) -> Tuple[jnp.ndarray, Dict]:
        outputs = outputs.reshape(targets.shape)
        ss_res = jnp.sum((targets - outputs) ** 2)
        ss_tot = jnp.sum((targets - jnp.mean(targets)) ** 2)
        loss = ss_res / (ss_tot + 1e-9)
        return loss, {"RSquaredLoss": loss}
