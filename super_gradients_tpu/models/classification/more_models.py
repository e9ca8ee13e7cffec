"""PreActResNet, GoogLeNet, SENet-Cifar — remaining small classification families.

Reference files: ``classification_models/preact_resnet.py`` (:124),
``googlenet.py`` (:241), ``senet.py`` (:120).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import ConvBNAct, SEBlock


class PreActBlock(nn.Module):
    """BN-relu-conv ordering (ref preact_resnet.py)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(x))
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            shortcut = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="shortcut")(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(out)
        out = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn2")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(out)
        return out + shortcut


class PreActResNet(nn.Module):
    num_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        for si, (planes, n) in enumerate(zip([64, 128, 256, 512], self.num_blocks)):
            for bi in range(n):
                x = PreActBlock(planes, stride=(2 if (bi == 0 and si > 0) else 1), name=f"layer{si + 1}_{bi}")(x, train=train)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn_final")(x))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="linear")(x)


class Inception(nn.Module):
    """GoogLeNet inception block (ref googlenet.py)."""

    n1x1: int
    n3x3red: int
    n3x3: int
    n5x5red: int
    n5x5: int
    pool_planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = ConvBNAct(out_channels=self.n1x1, kernel=1, act="relu", name="b1")(x, train=train)
        b2 = ConvBNAct(out_channels=self.n3x3red, kernel=1, act="relu", name="b2_red")(x, train=train)
        b2 = ConvBNAct(out_channels=self.n3x3, kernel=3, act="relu", name="b2")(b2, train=train)
        b3 = ConvBNAct(out_channels=self.n5x5red, kernel=1, act="relu", name="b3_red")(x, train=train)
        b3 = ConvBNAct(out_channels=self.n5x5, kernel=3, act="relu", name="b3a")(b3, train=train)
        b3 = ConvBNAct(out_channels=self.n5x5, kernel=3, act="relu", name="b3b")(b3, train=train)
        b4 = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        b4 = nn.max_pool(b4, (3, 3), strides=(1, 1))
        b4 = ConvBNAct(out_channels=self.pool_planes, kernel=1, act="relu", name="b4")(b4, train=train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class GoogLeNet(nn.Module):
    num_classes: int = 1000
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        def pool(x):
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            return nn.max_pool(x, (3, 3), strides=(2, 2))

        x = ConvBNAct(out_channels=64, kernel=7, stride=2, act="relu", name="pre1")(x, train=train)
        x = pool(x)
        x = ConvBNAct(out_channels=64, kernel=1, act="relu", name="pre2")(x, train=train)
        x = ConvBNAct(out_channels=192, kernel=3, act="relu", name="pre3")(x, train=train)
        x = pool(x)
        x = Inception(64, 96, 128, 16, 32, 32, name="a3")(x, train=train)
        x = Inception(128, 128, 192, 32, 96, 64, name="b3")(x, train=train)
        x = pool(x)
        x = Inception(192, 96, 208, 16, 48, 64, name="a4")(x, train=train)
        x = Inception(160, 112, 224, 24, 64, 64, name="b4")(x, train=train)
        x = Inception(128, 128, 256, 24, 64, 64, name="c4")(x, train=train)
        x = Inception(112, 144, 288, 32, 64, 64, name="d4")(x, train=train)
        x = Inception(256, 160, 320, 32, 128, 128, name="e4")(x, train=train)
        x = pool(x)
        x = Inception(256, 160, 320, 32, 128, 128, name="a5")(x, train=train)
        x = Inception(384, 192, 384, 48, 128, 128, name="b5")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc")(x)


class SEBasicBlock(nn.Module):
    """ResNet basic block + SE (ref senet.py)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNAct(out_channels=self.planes, kernel=3, stride=self.stride, act="relu", name="conv1")(x, train=train)
        out = ConvBNAct(out_channels=self.planes, kernel=3, act="identity", name="conv2")(out, train=train)
        out = SEBlock(max(1, self.planes // 16), name="se")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = ConvBNAct(out_channels=self.planes, kernel=1, stride=self.stride, act="identity", name="shortcut")(x, train=train)
        return nn.relu(out + x)


class SENetCifar(nn.Module):
    num_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=64, kernel=3, act="relu", name="conv1")(x, train=train)
        for si, (planes, n) in enumerate(zip([64, 128, 256, 512], self.num_blocks)):
            for bi in range(n):
                x = SEBasicBlock(planes, stride=(2 if (bi == 0 and si > 0) else 1), name=f"layer{si + 1}_{bi}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="linear")(x)
