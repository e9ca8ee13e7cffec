"""Smaller classification families: VGG, LeNet, ShuffleNetV2, DenseNet, GoogLeNet,
SENet/ResNeXt variants.

Reference files in ``classification_models/``: vgg.py (:46 cifar VGG), lenet.py
(:29), shufflenetv2.py (:242), densenet.py (:181), googlenet.py (:241),
senet.py (:120), resnext.py (:167).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import ConvBNAct

VGG_CFGS = {
    "vgg11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "vgg16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"),
    "vgg19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    """Cifar-style VGG (ref vgg.py)."""

    cfg: Tuple
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        i = 0
        for v in self.cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                # ref VGG convs keep bias=True (vgg.py:33 nn.Conv2d default)
                x = ConvBNAct(out_channels=int(v), kernel=3, act="relu", bias=True, name=f"conv_{i}")(x, train=train)
                i += 1
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="classifier")(x)


class LeNet(nn.Module):
    """ref lenet.py (32x32 inputs)."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(6, (5, 5), padding="VALID", name="conv1")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(16, (5, 5), padding="VALID", name="conv2")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(120, name="fc1")(x))
        x = nn.relu(nn.Dense(84, name="fc2")(x))
        return nn.Dense(self.num_classes, name="fc3")(x)


class ShuffleV2Block(nn.Module):
    """ref shufflenetv2.py ShuffleV2Block."""

    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        def channel_shuffle(y):
            b, h, w, c = y.shape
            y = y.reshape(b, h, w, 2, c // 2)
            y = jnp.swapaxes(y, 3, 4)
            return y.reshape(b, h, w, c)

        half = self.out_channels // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            y = ConvBNAct(out_channels=half, kernel=1, act="relu", name="b_conv1")(x2, train=train)
            y = ConvBNAct(out_channels=half, kernel=3, groups=half, act="identity", name="b_dw")(y, train=train)
            y = ConvBNAct(out_channels=half, kernel=1, act="relu", name="b_conv2")(y, train=train)
            out = jnp.concatenate([x1, y], axis=-1)
        else:
            cin = x.shape[-1]
            left = ConvBNAct(out_channels=cin, kernel=3, stride=2, groups=cin, act="identity", name="l_dw")(x, train=train)
            left = ConvBNAct(out_channels=half, kernel=1, act="relu", name="l_conv")(left, train=train)
            y = ConvBNAct(out_channels=half, kernel=1, act="relu", name="b_conv1")(x, train=train)
            y = ConvBNAct(out_channels=half, kernel=3, stride=2, groups=half, act="identity", name="b_dw")(y, train=train)
            y = ConvBNAct(out_channels=half, kernel=1, act="relu", name="b_conv2")(y, train=train)
            out = jnp.concatenate([left, y], axis=-1)
        return channel_shuffle(out)


class ShuffleNetV2(nn.Module):
    """ref shufflenetv2.py (x1.0: stage channels 116/232/464)."""

    num_classes: int = 1000
    stage_channels: Tuple[int, ...] = (116, 232, 464)
    stage_repeats: Tuple[int, ...] = (4, 8, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=24, kernel=3, stride=2, act="relu", name="stem")(x, train=train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for si, (c, n) in enumerate(zip(self.stage_channels, self.stage_repeats)):
            for bi in range(n):
                x = ShuffleV2Block(c, 2 if bi == 0 else 1, name=f"stage_{si}_{bi}")(x, train=train)
        x = ConvBNAct(out_channels=1024, kernel=1, act="relu", name="head_conv")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.BatchNorm(use_running_average=not train, name="norm1")(x)
        y = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False, name="conv1")(nn.relu(y))
        y = nn.BatchNorm(use_running_average=not train, name="norm2")(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(nn.relu(y))
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    """ref densenet.py (121: blocks (6,12,24,16), growth 32)."""

    num_classes: int = 1000
    growth_rate: int = 32
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    init_features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.init_features, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False, name="conv0")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, name="norm0")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for bi, n in enumerate(self.block_config):
            for li in range(n):
                x = DenseLayer(self.growth_rate, name=f"denseblock{bi + 1}_layer{li + 1}")(x, train=train)
            if bi != len(self.block_config) - 1:
                c = x.shape[-1] // 2
                x = nn.BatchNorm(use_running_average=not train, name=f"transition{bi + 1}_norm")(x)
                x = nn.Conv(c, (1, 1), use_bias=False, name=f"transition{bi + 1}_conv")(nn.relu(x))
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.BatchNorm(use_running_average=not train, name="norm5")(x))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="classifier")(x)


class ResNeXtBlock(nn.Module):
    """ref resnext.py grouped bottleneck (torch semantics: internal width =
    planes * base_width * cardinality / 64, output = planes * 4)."""

    planes: int
    cardinality: int = 32
    base_width: int = 4
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        width = self.planes * self.base_width * self.cardinality // 64
        out_c = self.planes * self.expansion
        y = ConvBNAct(out_channels=width, kernel=1, act="relu", name="conv1")(x, train=train)
        y = ConvBNAct(out_channels=width, kernel=3, stride=self.stride, groups=self.cardinality, act="relu", name="conv2")(y, train=train)
        y = ConvBNAct(out_channels=out_c, kernel=1, act="identity", name="conv3")(y, train=train)
        if self.stride != 1 or cin != out_c:
            x = ConvBNAct(out_channels=out_c, kernel=1, stride=self.stride, act="identity", name="shortcut")(x, train=train)
        return nn.relu(y + x)


class ResNeXt(nn.Module):
    """ResNeXt50 32x4d style."""

    num_classes: int = 1000
    num_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    cardinality: int = 32
    base_width: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=64, kernel=7, stride=2, act="relu", name="stem")(x, train=train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        planes = 64
        for si, n in enumerate(self.num_blocks):
            for bi in range(n):
                x = ResNeXtBlock(planes, self.cardinality, self.base_width, 2 if (bi == 0 and si > 0) else 1, name=f"layer{si + 1}_{bi}")(x, train=train)
            planes *= 2
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)
