"""ResNet family (flax, NHWC) — reference
``training/models/classification_models/resnet.py`` (BasicResNetBlock :26,
Bottleneck :53, ResNet :139, variants resnet18/34/50/... :212-300).

Structure and naming mirror the reference so torch checkpoints convert 1:1
(conv1/bn1 stem, layer1..4 of blocks with conv{1,2,3}/bn{1,2,3} + shortcut).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import width_multiplier


class BasicResNetBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    final_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=1 - self.bn_momentum, epsilon=self.bn_eps, name=name
        )
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(out)
        out = bn("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(
                self.planes * self.expansion, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="shortcut_conv"
            )(x)
            x = bn("shortcut_bn")(x)
        out = out + x
        return nn.relu(out) if self.final_relu else out


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    final_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=1 - self.bn_momentum, epsilon=self.bn_eps, name=name
        )
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, name="conv3")(out)
        out = bn("bn3")(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(
                self.planes * self.expansion, (1, 1), strides=(self.stride, self.stride), use_bias=False, name="shortcut_conv"
            )(x)
            x = bn("shortcut_bn")(x)
        out = out + x
        return nn.relu(out) if self.final_relu else out


class ResNet(nn.Module):
    """ImageNet-style ResNet (7x7 stem + maxpool). ref resnet.py:139-210."""

    num_blocks: Tuple[int, ...]
    num_classes: int = 1000
    block: str = "basic"  # basic | bottleneck
    width_mult: float = 1.0
    expansion: Optional[int] = None
    backbone_mode: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp = self.expansion if self.expansion is not None else (1 if self.block == "basic" else 4)
        block_cls = BasicResNetBlock if self.block == "basic" else BottleneckBlock
        wm = lambda c: width_multiplier(c, self.width_mult)

        x = nn.Conv(wm(64), (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        for layer_idx, (planes, n, stride) in enumerate(
            zip([wm(64), wm(128), wm(256), wm(512)], self.num_blocks, [1, 2, 2, 2])
        ):
            for b in range(n):
                x = block_cls(planes, stride=stride if b == 0 else 1, expansion=exp, name=f"layer{layer_idx + 1}_{b}")(
                    x, train=train
                )
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.backbone_mode:
            return x
        return nn.Dense(self.num_classes, name="linear")(x)


class CifarResNet(nn.Module):
    """CIFAR-style ResNet (3x3 stem, no maxpool). ref resnet.py:87-137."""

    num_blocks: Tuple[int, ...]
    num_classes: int = 10
    block: str = "basic"
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp = 1 if self.block == "basic" else 4
        block_cls = BasicResNetBlock if self.block == "basic" else BottleneckBlock
        wm = lambda c: width_multiplier(c, self.width_mult)
        x = nn.Conv(wm(64), (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x))
        for layer_idx, (planes, n, stride) in enumerate(
            zip([wm(64), wm(128), wm(256), wm(512)], self.num_blocks, [1, 2, 2, 2])
        ):
            for b in range(n):
                x = block_cls(planes, stride=stride if b == 0 else 1, expansion=exp, name=f"layer{layer_idx + 1}_{b}")(
                    x, train=train
                )
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="linear")(x)
