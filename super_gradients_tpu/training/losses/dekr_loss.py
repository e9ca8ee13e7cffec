"""DEKR heatmap + offset loss.

Reference: ``training/losses/dekr_loss.py`` — weighted MSE on (center + K) heatmaps
and smooth-L1 on per-pixel keypoint offsets, masked by offset weights. Targets come
pre-rendered (heatmap target generator, ``pose_estimation_datasets/target_generators.py``):
targets = (heatmaps [B,H,W,1+K], heatmap_mask [B,H,W,1+K], offsets [B,H,W,2K],
offset_weights [B,H,W,2K]).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_loss


@register_loss("DEKRLoss")
class DEKRLoss:
    def __init__(self, heatmap_loss_factor: float = 1.0, offset_loss_factor: float = 0.1):
        self.heatmap_loss_factor = heatmap_loss_factor
        self.offset_loss_factor = offset_loss_factor

    def __call__(self, outputs, targets) -> Tuple[jnp.ndarray, Dict]:
        heatmaps_t, mask, offsets_t, offset_w = targets
        hm = jax.nn.sigmoid(outputs.heatmaps.astype(jnp.float32))
        heatmap_loss = jnp.mean(((hm - heatmaps_t) ** 2) * mask)

        diff = jnp.abs(outputs.offsets.astype(jnp.float32) - offsets_t)
        smooth_l1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
        denom = jnp.maximum(jnp.sum(offset_w), 1.0)
        offset_loss = jnp.sum(smooth_l1 * offset_w) / denom

        loss = self.heatmap_loss_factor * heatmap_loss + self.offset_loss_factor * offset_loss
        return loss, {"heatmap_loss": heatmap_loss, "offset_loss": offset_loss}
