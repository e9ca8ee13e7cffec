"""RegNetY 200MF/400MF/600MF/800MF (flax, NHWC).

Reference: ``classification_models/regnet.py`` (335 LoC; XBlock with group conv +
SE for the Y family; per-variant (initial_width, slope, quantized_param, network
depth, bottleneck ratio, group width) from the RegNet paper/reference).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.modules.blocks import ConvBNAct, SEBlock

# variant: (initial_width, slope, quantized_param, depth, group_width, se_ratio)
REGNETY_PARAMS = {
    "regnetY200": (24, 36.44, 2.49, 13, 8, 0.25),
    "regnetY400": (48, 27.89, 2.09, 16, 8, 0.25),
    "regnetY600": (48, 32.54, 2.32, 15, 16, 0.25),
    "regnetY800": (56, 38.84, 2.4, 14, 16, 0.25),
}


def _generate_widths(initial_width: float, slope: float, q: float, depth: int, group_width: int) -> Tuple[List[int], List[int]]:
    """RegNet width generation (quantized log-space ladder) -> per-stage (widths, depths)."""
    widths_cont = np.arange(depth) * slope + initial_width
    ks = np.round(np.log(widths_cont / initial_width) / np.log(q))
    widths_all = initial_width * np.power(q, ks)
    widths_all = np.round(widths_all / 8) * 8
    widths_all = [int(min(w, w // group_width * group_width) or group_width) for w in widths_all]
    # group consecutive equal widths into stages
    stage_widths, stage_depths = [], []
    for w in widths_all:
        if stage_widths and stage_widths[-1] == w:
            stage_depths[-1] += 1
        else:
            stage_widths.append(w)
            stage_depths.append(1)
    return stage_widths, stage_depths


class YBlock(nn.Module):
    """RegNetY bottleneck block with group conv + SE."""

    out_channels: int
    stride: int
    group_width: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        groups = max(1, self.out_channels // self.group_width)
        y = ConvBNAct(out_channels=self.out_channels, kernel=1, act="relu", name="conv1")(x, train=train)
        y = ConvBNAct(out_channels=self.out_channels, kernel=3, stride=self.stride, groups=groups, act="relu", name="conv2")(y, train=train)
        y = SEBlock(max(1, int(cin * self.se_ratio)), name="se")(y)
        y = ConvBNAct(out_channels=self.out_channels, kernel=1, act="identity", name="conv3")(y, train=train)
        if self.stride != 1 or cin != self.out_channels:
            x = ConvBNAct(out_channels=self.out_channels, kernel=1, stride=self.stride, act="identity", name="shortcut")(x, train=train)
        return nn.relu(y + x)


class RegNetY(nn.Module):
    num_classes: int = 1000
    initial_width: float = 24
    slope: float = 36.44
    quantized_param: float = 2.49
    depth: int = 13
    group_width: int = 8
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=32, kernel=3, stride=2, act="relu", name="stem")(x, train=train)
        widths, depths = _generate_widths(self.initial_width, self.slope, self.quantized_param, self.depth, self.group_width)
        for si, (w, d) in enumerate(zip(widths, depths)):
            for bi in range(d):
                x = YBlock(w, 2 if bi == 0 else 1, self.group_width, self.se_ratio, name=f"stage_{si}_{bi}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)
