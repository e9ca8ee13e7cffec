"""RepVGG classification family (flax, NHWC).

Reference: ``classification_models/repvgg.py`` (204 LoC) — stages [1, 2, 4, 14, 1]
of RepVGGBlocks, width multipliers per variant (A0 .75/2.5, A1 1/2.5, A2 1.5/2.75,
B0 1/2.5 deeper). Deploy-time reparameterization via
``modules.blocks.fuse_repvgg_params`` (the reference's
``fuse_repvgg_blocks_residual_branches``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import RepVGGBlock


@dataclasses.dataclass(frozen=True)
class RepVGGCfg:
    num_classes: int = 1000
    blocks_per_stage: Tuple[int, ...] = (2, 4, 14, 1)
    width_a: float = 0.75  # stages 1-4 multiplier
    width_b: float = 2.5  # final stage multiplier
    se_ratio: float = 0.0  # >0 adds per-block SE (RepVGG-D2se)
    fused: str = "none"


REPVGG_VARIANTS = {
    "repvgg_a0": RepVGGCfg(width_a=0.75, width_b=2.5),
    "repvgg_a1": RepVGGCfg(width_a=1.0, width_b=2.5),
    "repvgg_a2": RepVGGCfg(width_a=1.5, width_b=2.75),
    "repvgg_b0": RepVGGCfg(blocks_per_stage=(4, 6, 16, 1), width_a=1.0, width_b=2.5),
    "repvgg_b1": RepVGGCfg(blocks_per_stage=(4, 6, 16, 1), width_a=2.0, width_b=4.0),
    "repvgg_b2": RepVGGCfg(blocks_per_stage=(4, 6, 16, 1), width_a=2.5, width_b=5.0),
    "repvgg_b3": RepVGGCfg(blocks_per_stage=(4, 6, 16, 1), width_a=3.0, width_b=5.0),
    "repvgg_d2se": RepVGGCfg(blocks_per_stage=(8, 14, 24, 1), width_a=2.5, width_b=5.0, se_ratio=1 / 16),
}


class RepVGG(nn.Module):
    cfg: RepVGGCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        widths = [
            min(64, int(64 * c.width_a)),
            int(64 * c.width_a),
            int(128 * c.width_a),
            int(256 * c.width_a),
            int(512 * c.width_b),
        ]
        x = RepVGGBlock(widths[0], stride=2, use_residual=False, fused=c.fused, name="stem")(x, train=train)
        for si, (w, n) in enumerate(zip(widths[1:], c.blocks_per_stage)):
            for bi in range(n):
                stride = 2 if bi == 0 else 1
                x = RepVGGBlock(
                    w, stride=stride, use_residual=(stride == 1 and x.shape[-1] == w), fused=c.fused,
                    se_ratio=c.se_ratio or None, name=f"stage{si + 1}_{bi}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(c.num_classes, name="linear")(x)
