"""Darknet-53 and CSPDarknet-53 classification models.

Reference: ``models/classification_models/darknet53.py`` (stem conv32 →
5 downsample stages with [1, 2, 8, 8, 4] residual blocks → GAP → FC) and the
``csp_darknet53.py`` variant that the YOLO family shares as a backbone — here the
classification head sits on our YOLOX CSPDarknet trunk (yolox.py).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import ConvBNAct


class DarkResidualBlock(nn.Module):
    """1x1 squeeze + 3x3 expand + residual (ref darknet53.py:21-40 DarkResidualBlock;
    LeakyReLU with the torch default 0.01 slope)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(out_channels=self.channels // 2, kernel=1, act="leaky_relu_01", name="conv1")(x, train=train)
        y = ConvBNAct(out_channels=self.channels, kernel=3, act="leaky_relu_01", name="conv2")(y, train=train)
        return x + y


class Darknet53(nn.Module):
    """ref darknet53.py Darknet53 (blocks [1, 2, 8, 8, 4])."""

    num_classes: int = 1000
    blocks: Tuple[int, ...] = (1, 2, 8, 8, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=32, kernel=3, act="leaky_relu_01", name="stem")(x, train=train)
        ch = 64
        for si, n in enumerate(self.blocks):
            x = ConvBNAct(out_channels=ch, kernel=3, stride=2, act="leaky_relu_01", name=f"down{si}")(x, train=train)
            for bi in range(n):
                x = DarkResidualBlock(ch, name=f"stage{si}_{bi}")(x, train=train)
            ch = min(ch * 2, 1024)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)


class CSPDarknet53(nn.Module):
    """CSPDarknet trunk (shared with YOLOX, yolox.py) + classifier head."""

    num_classes: int = 1000
    depth_mult: float = 1.0
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from super_gradients_tpu.models.detection.yolox import CSPDarknet

        feats = CSPDarknet(width=self.width_mult, depth=self.depth_mult, name="backbone")(x, train=train)
        x = jnp.mean(feats[-1], axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)
