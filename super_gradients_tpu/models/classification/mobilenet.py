"""MobileNet V1/V2/V3 (flax, NHWC).

Reference: ``classification_models/mobilenet.py`` (V1, 72 LoC),
``mobilenetv2.py`` (InvertedResidual, :254), ``mobilenetv3.py`` (SE + hardswish
blocks, small/large configs, :252).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import ConvBNAct, SEBlock, get_activation


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    """MBConv block (ref mobilenetv2.py InvertedResidual)."""

    out_channels: int
    stride: int
    expand_ratio: float
    kernel: int = 3
    act: str = "relu6"
    se_ratio: Optional[float] = None
    se_act: str = "relu"
    se_gate: str = "hardsigmoid"
    # MobileNetV3 expand blocks apply SE BETWEEN the depthwise BN and its
    # activation (ref mobilenetv3.py:98-113: conv, bn, SE, act); no-expand blocks
    # and MobileNetV2 activate first (ref :86-97)
    se_before_act: bool = False
    # also return the post-activation expanded features — SSD-lite taps
    # ['features', 14, 'conv', 2] (ssd_lite_mobilenetv2_arch_params.yaml)
    tap_expand: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = _make_divisible(cin * self.expand_ratio) if self.expand_ratio != 1 else cin
        y = x
        expanded = self.expand_ratio != 1
        if expanded:
            y = ConvBNAct(out_channels=hidden, kernel=1, act=self.act, name="expand")(y, train=train)
        expand_feats = y
        dw_act = "identity" if (self.se_before_act and expanded) else self.act
        y = ConvBNAct(out_channels=hidden, kernel=self.kernel, stride=self.stride, groups=hidden, act=dw_act, name="depthwise")(y, train=train)
        if self.se_ratio:
            y = SEBlock(_make_divisible(hidden * self.se_ratio), act=self.se_act, gate=self.se_gate, name="se")(y)
        if self.se_before_act and expanded:
            y = get_activation(self.act)(y)
        y = ConvBNAct(out_channels=self.out_channels, kernel=1, act="identity", name="project")(y, train=train)
        if self.stride == 1 and cin == self.out_channels:
            y = y + x
        if self.tap_expand:
            return y, expand_feats
        return y


class MobileNetV2(nn.Module):
    """ref mobilenetv2.py (width_mult=1.0, t/c/n/s table)."""

    num_classes: int = 1000
    width_mult: float = 1.0
    dropout: float = 0.2

    # (expand, channels, repeats, stride)
    CFG: Tuple = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        c0 = _make_divisible(32 * self.width_mult)
        x = ConvBNAct(out_channels=c0, kernel=3, stride=2, act="relu6", name="stem")(x, train=train)
        i = 0
        for t, c, n, s in self.CFG:
            cc = _make_divisible(c * self.width_mult)
            for j in range(n):
                x = InvertedResidual(cc, s if j == 0 else 1, t, name=f"block_{i}")(x, train=train)
                i += 1
        last = _make_divisible(1280 * max(1.0, self.width_mult))
        x = ConvBNAct(out_channels=last, kernel=1, act="relu6", name="head_conv")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="classifier")(x)


class MobileNetV3(nn.Module):
    """ref mobilenetv3.py small/large."""

    num_classes: int = 1000
    mode: str = "large"  # large | small
    width_mult: float = 1.0
    dropout: float = 0.2

    # (kernel, expand_ch, out_ch, se, act, stride)
    LARGE: Tuple = (
        (3, 16, 16, False, "relu", 1),
        (3, 64, 24, False, "relu", 2),
        (3, 72, 24, False, "relu", 1),
        (5, 72, 40, True, "relu", 2),
        (5, 120, 40, True, "relu", 1),
        (5, 120, 40, True, "relu", 1),
        (3, 240, 80, False, "hardswish", 2),
        (3, 200, 80, False, "hardswish", 1),
        (3, 184, 80, False, "hardswish", 1),
        (3, 184, 80, False, "hardswish", 1),
        (3, 480, 112, True, "hardswish", 1),
        (3, 672, 112, True, "hardswish", 1),
        (5, 672, 160, True, "hardswish", 2),
        (5, 960, 160, True, "hardswish", 1),
        (5, 960, 160, True, "hardswish", 1),
    )
    SMALL: Tuple = (
        (3, 16, 16, True, "relu", 2),
        (3, 72, 24, False, "relu", 2),
        (3, 88, 24, False, "relu", 1),
        (5, 96, 40, True, "hardswish", 2),
        (5, 240, 40, True, "hardswish", 1),
        (5, 240, 40, True, "hardswish", 1),
        (5, 120, 48, True, "hardswish", 1),
        (5, 144, 48, True, "hardswish", 1),
        (5, 288, 96, True, "hardswish", 2),
        (5, 576, 96, True, "hardswish", 1),
        (5, 576, 96, True, "hardswish", 1),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.LARGE if self.mode == "large" else self.SMALL
        x = ConvBNAct(out_channels=_make_divisible(16 * self.width_mult), kernel=3, stride=2, act="hardswish", name="stem")(x, train=train)
        for i, (k, exp, c, se, act, s) in enumerate(cfg):
            cin = x.shape[-1]
            cc = _make_divisible(c * self.width_mult)
            x = InvertedResidual(
                cc, s, _make_divisible(exp * self.width_mult) / cin, kernel=k, act=act,
                se_ratio=0.25 if se else None, se_before_act=True, name=f"block_{i}",
            )(x, train=train)
        last_exp = _make_divisible((960 if self.mode == "large" else 576) * self.width_mult)
        x = ConvBNAct(out_channels=last_exp, kernel=1, act="hardswish", name="head_conv")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        head_dim = 1280 if self.mode == "large" else 1024
        x = nn.Dense(head_dim, name="pre_classifier")(x)
        x = get_activation("hardswish")(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, name="classifier")(x)


class MobileNetV1(nn.Module):
    """ref mobilenet.py:13-64 MobileNet: conv1/bn1 stem + 13 dw/pw Blocks
    (conv1=depthwise, conv2=pointwise, each with its BN), then the reference's
    2x2 avg-pool + flatten + linear head (NOT global pool — the model is sized
    for ~64px inputs, CIFAR-style; flax sizes the Dense lazily so other inputs
    still work, but checkpoint parity holds at 64px)."""

    num_classes: int = 1000
    backbone_mode: bool = False

    CFG: Tuple = (64, 128, (128, 2), 256, (256, 2), 512, 512, 512, 512, 512, (512, 2), 1024, (1024, 2))

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)
        x = nn.relu(bn("bn1")(nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)))
        for i, c in enumerate(self.CFG):
            out, s = (c, 1) if isinstance(c, int) else c
            cin = x.shape[-1]
            x = nn.Conv(cin, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)), feature_group_count=cin,
                        use_bias=False, name=f"layers_{i}_conv1")(x)
            x = nn.relu(bn(f"layers_{i}_bn1")(x))
            x = nn.Conv(out, (1, 1), use_bias=False, name=f"layers_{i}_conv2")(x)
            x = nn.relu(bn(f"layers_{i}_bn2")(x))
        if self.backbone_mode:
            return x
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="linear")(x)
