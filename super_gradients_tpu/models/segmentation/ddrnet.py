"""DDRNet 23 / 23-slim / 39 (flax, NHWC).

Reference: ``segmentation_models/ddrnet.py`` — DAPPMBranch (:44), DAPPM (:108),
SegmentHead (:140), BasicDDRBackBone (:218), DDRNet (:271-545), variant params
(:582-610: 23 planes=64/highres=128/head=128 layers [2,2,2,2,1,2,2,1]; slim
planes=32/highres=64/head=64; 39 layers [3,4,3,3,1,3,3,1] head=256 layer3_repeats=2).

Dual-resolution: low-res trunk (layer1-5) + high-res skip branch at 1/8 with
bilateral fusion after layers 3/4 and DAPPM context at the bottom.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.classification.resnet import BasicResNetBlock, BottleneckBlock


def _resize_to(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="bilinear")


class ConvBN(nn.Module):
    """conv → BN (+ optional relu), torch ``ConvBN`` analogue (ddrnet.py:17-28)."""

    out_channels: int
    kernel: int = 3
    stride: int = 1
    add_relu: bool = False
    bias: bool = False  # ref default is True; DDRNet passes False everywhere except the stem

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), use_bias=self.bias, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        return nn.relu(x) if self.add_relu else x


def _make_layer(x, block: str, planes: int, num_blocks: int, stride: int, expansion: int, name: str, train: bool):
    """ref ddrnet.py:30-41: last block has final_relu=False."""
    cls = BasicResNetBlock if block == "basic" else BottleneckBlock
    for i in range(num_blocks):
        is_last = i == num_blocks - 1
        x = cls(
            planes,
            stride=stride if i == 0 else 1,
            expansion=expansion,
            final_relu=(num_blocks > 1 and not is_last),
            name=f"{name}_{i}",
        )(x, train=train)
    return x


class DAPPMBranch(nn.Module):
    """ref ddrnet.py:44-105."""

    kernel_size: int
    stride: int
    branch_planes: int

    @nn.compact
    def __call__(self, x, prev=None, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        y = x
        if self.stride == 0:
            y = jnp.mean(y, axis=(1, 2), keepdims=True)
        elif self.stride > 1:
            k, s = self.kernel_size, self.stride
            y = jnp.pad(y, ((0, 0), (s, s), (s, s), (0, 0)))
            y = nn.avg_pool(y, (k, k), strides=(s, s), count_include_pad=True)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.branch_planes, (1, 1), use_bias=False, name="conv")(y)
        y = _resize_to(y, h, w)
        if prev is not None:
            y = y + prev
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="process_bn")(y)
            y = nn.relu(y)
            y = nn.Conv(self.branch_planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="process_conv")(y)
        return y


class DAPPM(nn.Module):
    """Deep Aggregation Pyramid Pooling Module (ref ddrnet.py:108-138)."""

    branch_planes: int
    out_planes: int
    kernel_sizes: Tuple[int, ...] = (1, 5, 9, 17, 0)
    strides: Tuple[int, ...] = (1, 2, 4, 8, 0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, (k, s) in enumerate(zip(self.kernel_sizes, self.strides)):
            prev = outs[-1] if i > 0 else None
            outs.append(DAPPMBranch(k, s, self.branch_planes, name=f"branch_{i}")(x, prev, train=train))
        y = jnp.concatenate(outs, axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="compression_bn")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_planes, (1, 1), use_bias=False, name="compression_conv")(y)
        sc = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="shortcut_bn")(x)
        sc = nn.relu(sc)
        sc = nn.Conv(self.out_planes, (1, 1), use_bias=False, name="shortcut_conv")(sc)
        return y + sc


class DDRSegmentHead(nn.Module):
    """BN-relu-conv3x3 → BN-relu-conv1x1 → upscale (ref ddrnet.py:140-177)."""

    inter_planes: int
    out_planes: int
    scale_factor: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.Conv(self.inter_planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(nn.relu(x))
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(x)
        x = nn.Conv(self.out_planes, (1, 1), use_bias=True, name="conv2")(nn.relu(x))
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, h * self.scale_factor, w * self.scale_factor, c), method="bilinear")


@dataclasses.dataclass(frozen=True)
class DDRNetCfg:
    num_classes: int = 19
    planes: int = 64
    highres_planes: int = 128
    head_planes: int = 128
    spp_planes: int = 128
    layers: Tuple[int, ...] = (2, 2, 2, 2, 1, 2, 2, 1)  # backbone[:4] + additional[4:]
    layer3_repeats: int = 1
    layer5_bottleneck_expansion: int = 2
    use_aux_heads: bool = False


DDRNET_23_CFG = DDRNetCfg()
DDRNET_23_SLIM_CFG = DDRNetCfg(planes=32, highres_planes=64, head_planes=64)
DDRNET_39_CFG = DDRNetCfg(layers=(3, 4, 3, 3, 1, 3, 3, 1), head_planes=256, layer3_repeats=2)


class DDRNet(nn.Module):
    """ref DDRNet (ddrnet.py:271-545), segmentation mode."""

    cfg: DDRNetCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        w = c.planes
        hp = c.highres_planes
        bl, add = c.layers[:4], c.layers[4:]
        out_h, out_w = x.shape[1] // 8, x.shape[2] // 8

        # stem: two stride-2 ConvBN+relu
        x = ConvBN(w, 3, 2, add_relu=True, bias=True, name="stem_0")(x, train=train)
        x = ConvBN(w, 3, 2, add_relu=True, bias=True, name="stem_1")(x, train=train)
        x = _make_layer(x, "basic", w, bl[0], 1, 1, "layer1", train)
        x = _make_layer(nn.relu(x), "basic", w * 2, bl[1], 2, 1, "layer2", train)
        x_skip = x

        for i in range(c.layer3_repeats):
            out_layer3 = _make_layer(nn.relu(x), "basic", w * 4, bl[2], 2 if i == 0 else 1, 1, f"layer3_{i}", train)
            out_layer3_skip = _make_layer(nn.relu(x_skip), "basic", hp, add[1], 1, 1, f"layer3_skip_{i}", train)
            down = ConvBN(w * 4, 3, 2, name=f"down3_{i}")(nn.relu(out_layer3_skip), train=train)
            x = out_layer3 + down
            comp = ConvBN(hp, 1, 1, name=f"compression3_{i}")(nn.relu(out_layer3), train=train)
            x_skip = out_layer3_skip + _resize_to(comp, out_h, out_w)
        aux_feat = x_skip

        out_layer4 = _make_layer(nn.relu(x), "basic", w * 8, bl[3], 2, 1, "layer4", train)
        out_layer4_skip = _make_layer(nn.relu(x_skip), "basic", hp, add[2], 1, 1, "layer4_skip", train)
        d4 = ConvBN(hp * 2, 3, 2, add_relu=True, name="down4_0")(nn.relu(out_layer4_skip), train=train)
        d4 = ConvBN(w * 8, 3, 2, name="down4_1")(d4, train=train)
        x = out_layer4 + d4
        comp4 = ConvBN(hp, 1, 1, name="compression4")(nn.relu(out_layer4), train=train)
        x_skip = out_layer4_skip + _resize_to(comp4, out_h, out_w)

        out_layer5_skip = _make_layer(
            nn.relu(x_skip), "bottleneck", hp, add[3], 1, c.layer5_bottleneck_expansion, "layer5_skip", train
        )
        x = _make_layer(nn.relu(x), "bottleneck", w * 8, add[0], 2, c.layer5_bottleneck_expansion, "layer5", train)
        x = DAPPM(c.spp_planes, hp * c.layer5_bottleneck_expansion, name="spp")(x, train=train)
        x = _resize_to(x, out_h, out_w)
        main = DDRSegmentHead(c.head_planes, c.num_classes, 8, name="final_layer")(x + out_layer5_skip, train=train)

        if not c.use_aux_heads:
            return main
        aux = DDRSegmentHead(c.head_planes, c.num_classes, 8, name="seghead_extra")(aux_feat, train=train)
        if not train:
            return main
        return main, aux
