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
# — the REFERENCE's own constants (regnet.py:314-335), not the paper's: checkpoint
# parity requires reproducing its exact width ladder.
REGNETY_PARAMS = {
    "regnetY200": (24, 36, 2.5, 13, 8, 0.25),
    "regnetY400": (48, 28, 2.1, 16, 8, 0.25),
    "regnetY600": (48, 33, 2.3, 15, 16, 0.25),
    "regnetY800": (56, 39, 2.4, 14, 16, 0.25),
}


def _generate_widths(initial_width: float, slope: float, q: float, depth: int, group_width: int) -> Tuple[List[int], List[int]]:
    """Per-stage (widths, depths), matching the reference's
    ``regnet_params_to_blocks`` (regnet.py:193-208) number-for-number:
    8-divisible quantized log ladder, then np.unique stage grouping, then a final
    round-to-group-width adjustment (bottleneck_ratio is 1 for the Y family)."""
    pw = initial_width + slope * np.arange(depth)
    pb = np.round(np.log(pw / initial_width) / np.log(q))
    qw = 8 * np.round(initial_width * np.power(q, pb) / 8)
    stage_widths, stage_depths = np.unique(qw.astype(np.int64), return_counts=True)
    gw = np.minimum(group_width, stage_widths)
    stage_widths = (np.round(stage_widths / gw) * gw).astype(np.int64)
    return stage_widths.tolist(), stage_depths.tolist()


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
