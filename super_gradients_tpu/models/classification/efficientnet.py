"""EfficientNet B0-B4 (flax, NHWC).

Reference: ``classification_models/efficientnet.py`` (842 LoC MBConv +
compound-scaling coefficients). Width/depth coefficients per variant match the
paper/reference table; blocks are MBConv with SE (ratio 0.25) and swish.
"""

from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import ConvBNAct, SEBlock

# (expand, channels, repeats, stride, kernel)
_BASE_CFG = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# variant: (width_coeff, depth_coeff, resolution, dropout)
EFFICIENTNET_PARAMS = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
    "b8": (2.2, 3.6, 672, 0.5),
    "l2": (4.3, 5.3, 800, 0.5),
}


def _round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class MBConv(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    kernel: int
    bn_momentum: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = ConvBNAct(out_channels=hidden, kernel=1, act="silu", bn_momentum=self.bn_momentum, bn_eps=1e-3, padding="same", name="expand")(y, train=train)
        y = ConvBNAct(
            out_channels=hidden, kernel=self.kernel, stride=self.stride, groups=hidden, act="silu",
            bn_momentum=self.bn_momentum, bn_eps=1e-3, padding="same", name="depthwise",
        )(y, train=train)
        y = SEBlock(max(1, cin // 4), act="silu", gate="sigmoid", name="se")(y)
        y = ConvBNAct(out_channels=self.out_channels, kernel=1, act="identity", bn_momentum=self.bn_momentum, bn_eps=1e-3, padding="same", name="project")(y, train=train)
        if self.stride == 1 and cin == self.out_channels:
            y = y + x
        return y


class EfficientNet(nn.Module):
    num_classes: int = 1000
    width_coeff: float = 1.0
    depth_coeff: float = 1.0
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=_round_filters(32, self.width_coeff), kernel=3, stride=2, act="silu", bn_momentum=0.01, bn_eps=1e-3, padding="same", name="stem")(x, train=train)
        i = 0
        for expand, c, n, s, k in _BASE_CFG:
            cc = _round_filters(c, self.width_coeff)
            for j in range(_round_repeats(n, self.depth_coeff)):
                x = MBConv(cc, s if j == 0 else 1, expand, k, name=f"block_{i}")(x, train=train)
                i += 1
        x = ConvBNAct(out_channels=_round_filters(1280, self.width_coeff), kernel=1, act="silu", bn_momentum=0.01, bn_eps=1e-3, padding="same", name="head_conv")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc")(x)
