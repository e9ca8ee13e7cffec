"""RegSeg 48/53 (flax, NHWC).

Reference: ``segmentation_models/regseg.py`` — DBlock with split dilated group convs
+ SE (:125), AdaptiveShortcutBlock (:74), 3-stage decoder (:174), RegSeg48 config
(:17-53). Stem is a stride-2 conv32; stage tuples are
(out_channels, dilations, group_width, stride, se_ratio).
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.segmentation.stdc import _upsample
from super_gradients_tpu.modules.blocks import ConvBNAct

REGSEG48_STAGES = (
    ((48, (1,), 16, 2, 4),),
    ((128, (1,), 16, 2, 4), (128, (1,), 16, 1, 4), (128, (1,), 16, 1, 4)),
    (
        (256, (1,), 16, 2, 4),
        (256, (1,), 16, 1, 4),
        (256, (1, 2), 16, 1, 4),
        *(((256, (1, 4), 16, 1, 4),) * 4),
        *(((256, (1, 14), 16, 1, 4),) * 6),
        (320, (1, 14), 16, 1, 4),
    ),
)


class DBlock(nn.Module):
    """ref regseg.py:125-171."""

    out_channels: int
    dilations: Tuple[int, ...]
    group_width: int
    stride: int
    se_ratio: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        oc = self.out_channels
        y = ConvBNAct(out_channels=oc, kernel=1, act="relu", name="conv1")(x, train=train)
        # split dilated group conv
        n = len(self.dilations)
        if n == 1:
            d = self.dilations[0]
            y = nn.Conv(
                oc, (3, 3), strides=(self.stride, self.stride), padding=((d, d), (d, d)),
                kernel_dilation=(d, d), feature_group_count=oc // self.group_width,
                use_bias=False, name="dconv",
            )(y)
        else:
            splits = jnp.split(y, n, axis=-1)
            outs = []
            gc = oc // n
            for i, (s, d) in enumerate(zip(splits, self.dilations)):
                outs.append(
                    nn.Conv(
                        gc, (3, 3), strides=(self.stride, self.stride),
                        padding=((d, d), (d, d)), kernel_dilation=(d, d),
                        feature_group_count=gc // self.group_width, use_bias=False, name=f"dconv_{i}",
                    )(s)
                )
            y = jnp.concatenate(outs, axis=-1)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn2")(y))
        # SE
        se = jnp.mean(y, axis=(1, 2), keepdims=True)
        se = nn.relu(nn.Conv(cin // self.se_ratio, (1, 1), use_bias=True, name="se_fc1")(se))
        se = jax.nn.sigmoid(nn.Conv(oc, (1, 1), use_bias=True, name="se_fc2")(se))
        y = y * se
        y = ConvBNAct(out_channels=oc, kernel=1, act="identity", name="conv3")(y, train=train)
        # adaptive shortcut
        sc = x
        if self.stride > 1:
            sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
        if cin != oc or self.stride > 1:
            sc = ConvBNAct(out_channels=oc, kernel=1, act="identity", name="shortcut")(sc, train=train)
        return nn.relu(y + sc)


@dataclasses.dataclass(frozen=True)
class RegSegCfg:
    num_classes: int = 19
    stages: Tuple = REGSEG48_STAGES
    projection_out_channels: Tuple[int, ...] = (8, 128, 128)
    head_mid_channels: int = 64


class RegSeg(nn.Module):
    """ref RegSeg (regseg.py:254)."""

    cfg: RegSegCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        # ref stem ConvBNReLU leaves bias at its True default (regseg.py:318)
        x = ConvBNAct(out_channels=32, kernel=3, stride=2, act="relu", bias=True, name="stem")(x, train=train)
        stage_outs = []
        for si, stage in enumerate(c.stages):
            for bi, (oc, dil, gw, stride, se) in enumerate(stage):
                x = DBlock(oc, tuple(dil), gw, stride, se, name=f"stage{si}_{bi}")(x, train=train)
            stage_outs.append(x)

        # decoder (ref :174-203): proj2 up + proj1 -> conv -> up -> cat proj0
        p = c.projection_out_channels
        # decoder upsamples are align_corners=True (ref regseg.py:188)
        proj2 = ConvBNAct(out_channels=p[2], kernel=1, act="relu", name="proj2")(stage_outs[2], train=train)
        proj2 = _upsample(proj2, 2, "bilinear_ac")
        proj1 = ConvBNAct(out_channels=p[1], kernel=1, act="relu", name="proj1")(stage_outs[1], train=train)
        y = proj1 + proj2
        y = ConvBNAct(out_channels=p[1] // 2, kernel=3, act="relu", name="decoder_conv")(y, train=train)
        y = _upsample(y, 2, "bilinear_ac")
        proj0 = ConvBNAct(out_channels=p[0], kernel=1, act="relu", name="proj0")(stage_outs[0], train=train)
        y = jnp.concatenate([y, proj0], axis=-1)

        y = ConvBNAct(out_channels=c.head_mid_channels, kernel=3, act="relu", name="head_conv")(y, train=train)
        y = nn.Conv(c.num_classes, (1, 1), use_bias=True, name="head_pred")(y)
        b, h, w, cc = y.shape
        return jax.image.resize(y, (b, h * 4, w * 4, cc), "bilinear")
