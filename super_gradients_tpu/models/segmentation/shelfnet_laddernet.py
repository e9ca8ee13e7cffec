"""ShelfNet (LW) and LadderNet (flax, NHWC).

Reference: ``segmentation_models/shelfnet.py`` (687 LoC: ResNet backbone →
1x1 reductions → shelf of decoder/encoder/decoder columns built from shared-weight
S-blocks → FCN heads) and ``laddernet.py`` (630 LoC: ResNet backbone + ladder
up/down branches of residual blocks).

Both are multi-column ladder architectures over ResNet features at strides
4/8/16/32; the S-block shares its two 3x3 conv weights (ShelfBlock, shelfnet.py:35).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.classification.resnet import BasicResNetBlock, BottleneckBlock
from super_gradients_tpu.modules.blocks import ConvBNAct


class ShelfBlock(nn.Module):
    """S-Block: two 3x3 convs with SHARED weights + residual (ref shelfnet.py:35-72)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="shared_conv")
        y = conv(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(y))
        y = conv(y)  # second application REUSES the same kernel (weight sharing)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        return nn.relu(x + y)


class _ResNetFeatures(nn.Module):
    """ResNet trunk returning feats at strides 4/8/16/32 (basic or bottleneck)."""

    widths: Tuple[int, ...] = (64, 128, 256, 512)
    blocks: Tuple[int, ...] = (2, 2, 2, 2)
    block: str = "basic"  # basic | bottleneck (ShelfNet50/101 use bottleneck)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=64, kernel=7, stride=2, act="relu", name="conv1")(x, train=train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        blk = BasicResNetBlock if self.block == "basic" else BottleneckBlock
        feats = []
        for li, (w, n) in enumerate(zip(self.widths, self.blocks)):
            for bi in range(n):
                x = blk(w, stride=2 if (bi == 0 and li > 0) else 1, name=f"layer{li + 1}_{bi}")(x, train=train)
            feats.append(x)
        return feats


@dataclasses.dataclass(frozen=True)
class ShelfNetCfg:
    num_classes: int = 19
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    backbone_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    block: str = "basic"  # shelfnet50/101: "bottleneck" with (3,4,6,3)/(3,4,23,3)


class ShelfNet(nn.Module):
    """ShelfNet18-LW (ref shelfnet.py ShelfNetLW / ShelfNet18)."""

    cfg: ShelfNetCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        in_h, in_w = x.shape[1], x.shape[2]
        feats = _ResNetFeatures(c.widths, getattr(c, "backbone_blocks", (2, 2, 2, 2)),
                                getattr(c, "block", "basic"), name="backbone")(x, train=train)
        # 1x1 reductions (ref ConvBNReLU reducers)
        feats = [
            ConvBNAct(out_channels=w, kernel=1, act="relu", name=f"reduce{i}")(f, train=train)
            for i, (f, w) in enumerate(zip(feats, c.widths))
        ]

        def up(x, w, skip, name):
            x = ShelfBlock(x.shape[-1], name=f"{name}_s")(x, train=train)
            b, h, ww, _ = x.shape
            x = ConvBNAct(out_channels=w, kernel=1, act="relu", name=f"{name}_proj")(x, train=train)
            x = jax.image.resize(x, (b, h * 2, ww * 2, w), "bilinear")
            return nn.relu(x + skip)

        def down(x, w, skip, name):
            x = ShelfBlock(x.shape[-1], name=f"{name}_s")(x, train=train)
            x = ConvBNAct(out_channels=w, kernel=3, stride=2, act="relu", name=f"{name}_down")(x, train=train)
            return nn.relu(x + skip)

        # column 1: decoder (deep -> shallow)
        d = feats[3]
        col1 = [None, None, None, d]
        for i in [2, 1, 0]:
            d = up(d, c.widths[i], feats[i], f"dec1_{i}")
            col1[i] = d
        # column 2: encoder (shallow -> deep) with skips from column 1
        e = col1[0]
        col2 = [e, None, None, None]
        for i in [1, 2, 3]:
            e = down(e, c.widths[i], col1[i], f"enc_{i}")
            col2[i] = e
        # column 3: final decoder
        d = col2[3]
        for i in [2, 1, 0]:
            d = up(d, c.widths[i], col2[i], f"dec2_{i}")
        # FCN head at stride 4
        y = ConvBNAct(out_channels=c.widths[0], kernel=3, act="relu", name="head_conv")(d, train=train)
        y = nn.Conv(c.num_classes, (1, 1), name="head_pred")(y)
        return jax.image.resize(y, (x.shape[0], in_h, in_w, c.num_classes), "bilinear")


@dataclasses.dataclass(frozen=True)
class LadderNetCfg:
    num_classes: int = 19
    widths: Tuple[int, ...] = (64, 128, 256, 512)


class LadderNet(nn.Module):
    """LadderNet-50-3433-style single ladder (ref laddernet.py:326-500)."""

    cfg: LadderNetCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        in_h, in_w = x.shape[1], x.shape[2]
        feats = _ResNetFeatures(c.widths, name="backbone")(x, train=train)
        # ladder up-branch: residual up-blocks summing backbone skips
        d = feats[3]
        for i in [2, 1, 0]:
            b, h, w, _ = d.shape
            d = ConvBNAct(out_channels=c.widths[i], kernel=1, act="relu", name=f"up_proj{i}")(d, train=train)
            d = jax.image.resize(d, (b, h * 2, w * 2, c.widths[i]), "bilinear")
            d = nn.relu(d + feats[i])
            d = BasicResNetBlock(c.widths[i], name=f"up_block{i}")(d, train=train)
        y = nn.Conv(c.num_classes, (1, 1), name="final")(d)
        return jax.image.resize(y, (x.shape[0], in_h, in_w, c.num_classes), "bilinear")
