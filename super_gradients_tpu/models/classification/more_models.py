"""PreActResNet, GoogLeNet, SENet-Cifar — remaining small classification families.

Reference files: ``classification_models/preact_resnet.py`` (:124),
``googlenet.py`` (:241), ``senet.py`` (:120).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
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
        # ref forward has NO final BN/relu (preact_resnet.py forward: conv1 ->
        # layers -> avg_pool -> linear)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="linear")(x)


def _ceil_maxpool(x, k: int, s: int):
    """torch MaxPool2d(k, s, ceil_mode=True): overhang is padded on the RIGHT/BOTTOM
    only (googlenet.py:29-43 pools) — symmetric padding would shift every window."""
    import math

    b, h, w, c = x.shape
    out_h = math.ceil((h - k) / s) + 1
    out_w = math.ceil((w - k) / s) + 1
    pad_h = max(0, (out_h - 1) * s + k - h)
    pad_w = max(0, (out_w - 1) * s + k - w)
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), constant_values=-jnp.inf)
    return nn.max_pool(x, (k, k), strides=(s, s))


class Inception(nn.Module):
    """GoogLeNet inception block, torchvision layout (ref googlenet.py:169-192:
    branch3 is red + ONE 3x3; branch names/Sequential indices preserved)."""

    n1x1: int
    n3x3red: int
    n3x3: int
    n5x5red: int
    n5x5: int
    pool_planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda c, k, name: ConvBNAct(out_channels=c, kernel=k, act="relu", bn_eps=1e-3, name=name)
        b1 = conv(self.n1x1, 1, "branch1")(x, train=train)
        b2 = conv(self.n3x3red, 1, "branch2_0")(x, train=train)
        b2 = conv(self.n3x3, 3, "branch2_1")(b2, train=train)
        b3 = conv(self.n5x5red, 1, "branch3_0")(x, train=train)
        b3 = conv(self.n5x5, 3, "branch3_1")(b3, train=train)
        b4 = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        b4 = nn.max_pool(b4, (3, 3), strides=(1, 1))
        b4 = conv(self.pool_planes, 1, "branch4_1")(b4, train=train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class GoogLeNet(nn.Module):
    """torchvision-layout GoogLeNet (ref googlenet.py:18-132, aux_logits=False)."""

    num_classes: int = 1000
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda c, k, stride, name: ConvBNAct(out_channels=c, kernel=k, stride=stride, act="relu", bn_eps=1e-3, name=name)
        x = conv(64, 7, 2, "conv1")(x, train=train)
        x = _ceil_maxpool(x, 3, 2)
        x = conv(64, 1, 1, "conv2")(x, train=train)
        x = conv(192, 3, 1, "conv3")(x, train=train)
        x = _ceil_maxpool(x, 3, 2)
        x = Inception(64, 96, 128, 16, 32, 32, name="inception3a")(x, train=train)
        x = Inception(128, 128, 192, 32, 96, 64, name="inception3b")(x, train=train)
        x = _ceil_maxpool(x, 3, 2)
        x = Inception(192, 96, 208, 16, 48, 64, name="inception4a")(x, train=train)
        x = Inception(160, 112, 224, 24, 64, 64, name="inception4b")(x, train=train)
        x = Inception(128, 128, 256, 24, 64, 64, name="inception4c")(x, train=train)
        x = Inception(112, 144, 288, 32, 64, 64, name="inception4d")(x, train=train)
        x = Inception(256, 160, 320, 32, 128, 128, name="inception4e")(x, train=train)
        x = _ceil_maxpool(x, 2, 2)
        x = Inception(256, 160, 320, 32, 128, 128, name="inception5a")(x, train=train)
        x = Inception(384, 192, 384, 48, 128, 128, name="inception5b")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="fc")(x)


class SEBasicBlock(nn.Module):
    """SENet18's pre-activation SE block (ref senet.py:45-75 PreActBlock:
    relu(bn1(x)) feeds BOTH the residual path and the (BN-less) shortcut; SE gate
    on the second conv's output; no final relu)."""

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(x))
        if self.stride != 1 or x.shape[-1] != self.planes:
            shortcut = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, name="shortcut_conv")(out)
        else:
            shortcut = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(out)
        out = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn2")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(out)
        w = jnp.mean(out, axis=(1, 2), keepdims=True)
        w = nn.relu(nn.Conv(self.planes // 16, (1, 1), use_bias=True, name="fc1")(w))
        w = jax.nn.sigmoid(nn.Conv(self.planes, (1, 1), use_bias=True, name="fc2")(w))
        return out * w + shortcut


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
