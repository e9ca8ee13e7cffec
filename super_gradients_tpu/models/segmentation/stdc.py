"""STDC segmentation family (flax, NHWC).

Reference: ``training/models/segmentation_models/stdc.py`` — STDCBlock (:33),
STDCBackbone (:128), ContextPath (:377), AttentionRefinementModule (:296),
FeatureFusionModule (:316), STDCSegmentationBase (:442), STDC1/2 variants
(:734-795); SegmentationHead from ``segmentation_models/common.py:5``.

Channel configs identical to the reference (STDC1: widths [32,64,256,512,1024],
blocks [1,1,2,2,2]; STDC2: blocks [1,1,4,5,3]; seg defaults fuse=128, ffm=256,
aux=64, detail=64) so torch checkpoints convert.

Training mode returns (main, aux32, aux16, detail8) logits at input resolution —
consumed by the STDC detail/aux loss; eval returns the main map only.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import ConvBNAct


def _upsample(x: jnp.ndarray, scale: int, method: str = "nearest") -> jnp.ndarray:
    b, h, w, c = x.shape
    if method == "nearest":
        return jax.image.resize(x, (b, h * scale, w * scale, c), method="nearest")
    if method == "bilinear_ac":
        # torch nn.Upsample(..., align_corners=True) — the reference's seg-head
        # upsample (stdc.py:478-496); jax.image.resize is half-pixel (align=False),
        # so interpolate explicitly on the align-corners grid
        ho, wo = h * scale, w * scale
        ys = jnp.linspace(0.0, h - 1.0, ho)
        xs = jnp.linspace(0.0, w - 1.0, wo)
        y0 = jnp.floor(ys).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        wy = (ys - y0)[None, :, None, None]
        x0 = jnp.floor(xs).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wx = (xs - x0)[None, None, :, None]
        rt = x[:, y0]
        rb = x[:, y1]
        top = rt[:, :, x0] * (1 - wx) + rt[:, :, x1] * wx
        bot = rb[:, :, x0] * (1 - wx) + rb[:, :, x1] * wx
        return top * (1 - wy) + bot * wy
    return jax.image.resize(x, (b, h * scale, w * scale, c), method=method)


class STDCBlock(nn.Module):
    """Short-Term-Dense-Concatenate block (ref stdc.py:33-99)."""

    out_channels: int
    steps: int = 4
    stride: int = 1
    downsample_mode: str = "avg_pool"

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(ConvBNAct, act="relu")
        half = self.out_channels // 2
        x = conv(out_channels=half, kernel=1, name="conv_list_0")(x, train=train)
        out_list = []
        if self.stride == 1:
            out_list.append(x)
        else:  # avg_pool skip for the first step
            skip = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            skip = nn.avg_pool(skip, (3, 3), strides=(2, 2), count_include_pad=True)
            out_list.append(skip)

        mid = half
        cin = half
        y = x
        for idx in range(1, self.steps):
            if idx < self.steps - 1:
                mid //= 2
            if idx == 1 and self.stride == 2:
                # depthwise stride-2 conv before the second step
                y = ConvBNAct(
                    out_channels=cin, kernel=3, stride=2, groups=cin, act="identity", name="conv_list_1_dw"
                )(y, train=train)
            y = conv(out_channels=mid, kernel=3, name=f"conv_list_{idx}")(y, train=train)
            out_list.append(y)
            cin = mid
        return jnp.concatenate(out_list, axis=-1)


@dataclasses.dataclass(frozen=True)
class STDCBackboneCfg:
    block_types: Tuple[str, ...] = ("conv", "conv", "stdc", "stdc", "stdc")
    ch_widths: Tuple[int, ...] = (32, 64, 256, 512, 1024)
    num_blocks: Tuple[int, ...] = (1, 1, 2, 2, 2)
    stdc_steps: int = 4
    out_down_ratios: Tuple[int, ...] = (8, 16, 32)


STDC1_CFG = STDCBackboneCfg()
STDC2_CFG = STDCBackboneCfg(num_blocks=(1, 1, 4, 5, 3))


class STDCBackbone(nn.Module):
    """ref stdc.py:128-232."""

    cfg: STDCBackboneCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        outputs = []
        down_ratio = 2
        for si, (btype, width, blocks) in enumerate(zip(c.block_types, c.ch_widths, c.num_blocks)):
            for bi in range(blocks):
                stride = 2 if bi == 0 else 1
                name = f"block_s{down_ratio}_{bi}"
                if btype == "conv":
                    x = ConvBNAct(out_channels=width, kernel=3, stride=stride, act="relu", name=name)(x, train=train)
                else:
                    x = STDCBlock(out_channels=width, steps=c.stdc_steps, stride=stride, name=name)(x, train=train)
            if down_ratio in c.out_down_ratios:
                outputs.append(x)
            down_ratio *= 2
        return tuple(outputs)


class STDCClassification(nn.Module):
    """STDC backbone + squared-feature classifier head (ref stdc.py:237-279:
    ``conv_last(x)^2 → GAP → FC → ReLU → dropout → linear``)."""

    backbone_cfg: STDCBackboneCfg = STDC1_CFG
    num_classes: int = 1000
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = STDCBackbone(self.backbone_cfg, name="backbone")(x, train=train)
        out = feats[-1]
        head_channels = max(1024, out.shape[-1])
        out = ConvBNAct(out_channels=head_channels, kernel=1, act="relu", name="conv_last")(out, train=train)
        out = jnp.mean(out**2, axis=(1, 2))
        out = nn.relu(nn.Dense(head_channels, use_bias=False, name="fc")(out))
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return nn.Dense(self.num_classes, use_bias=False, name="linear")(out)


class AttentionRefinementModule(nn.Module):
    """ref stdc.py:296-313."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=self.out_channels, kernel=3, act="relu", name="conv_first")(x, train=train)
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = ConvBNAct(out_channels=self.out_channels, kernel=1, act="identity", name="attention_conv")(y, train=train)
        return x * jax.nn.sigmoid(y)


class FeatureFusionModule(nn.Module):
    """ref stdc.py:316-346."""

    out_channels: int

    @nn.compact
    def __call__(self, spatial_feats, context_feats, train: bool = False):
        feat = jnp.concatenate([spatial_feats, context_feats], axis=-1)
        feat = ConvBNAct(out_channels=self.out_channels, kernel=1, act="relu", name="pw_conv")(feat, train=train)
        a = jnp.mean(feat, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.out_channels // 4, (1, 1), use_bias=False, name="attention_conv1")(a)
        a = nn.relu(a)
        a = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="attention_conv2")(a)
        atten = jax.nn.sigmoid(a)
        return feat * atten + feat


class SegmentationHead(nn.Module):
    """ConvBNReLU 3x3 → dropout → 1x1 conv (ref common.py:5-15)."""

    mid_channels: int
    num_classes: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=self.mid_channels, kernel=3, act="relu", name="conv")(x, train=train)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), use_bias=False, name="pred")(x)


@dataclasses.dataclass(frozen=True)
class STDCSegCfg:
    backbone: STDCBackboneCfg = STDC1_CFG
    num_classes: int = 19
    context_fuse_channels: int = 128
    ffm_channels: int = 256
    aux_head_channels: int = 64
    detail_head_channels: int = 64
    use_aux_heads: bool = True
    dropout: float = 0.2


class STDCSegmentation(nn.Module):
    """BiSeNet-style STDC segmentation (ref STDCSegmentationBase, stdc.py:442-600)."""

    cfg: STDCSegCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        feat8, feat16, feat32 = STDCBackbone(c.backbone, name="backbone")(x, train=train)

        # context path
        ce = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        ce = ConvBNAct(out_channels=c.context_fuse_channels, kernel=1, act="relu", name="context_embedding")(ce, train=train)
        ce = jnp.broadcast_to(ce, (feat32.shape[0], feat32.shape[1], feat32.shape[2], c.context_fuse_channels))

        f32 = AttentionRefinementModule(c.context_fuse_channels, name="arm32")(feat32, train=train) + ce
        f32_up = _upsample(f32, 2, "nearest")
        f32_up = ConvBNAct(out_channels=c.context_fuse_channels, kernel=3, act="relu", name="upsample32_conv")(f32_up, train=train)

        f16 = AttentionRefinementModule(c.context_fuse_channels, name="arm16")(feat16, train=train) + f32_up
        f16_up = _upsample(f16, 2, "nearest")
        f16_up = ConvBNAct(out_channels=c.context_fuse_channels, kernel=3, act="relu", name="upsample16_conv")(f16_up, train=train)

        fused = FeatureFusionModule(c.ffm_channels, name="ffm")(feat8, f16_up, train=train)
        main = SegmentationHead(c.ffm_channels, c.num_classes, c.dropout, name="segmentation_head")(fused, train=train)
        main = _upsample(main, 8, "bilinear_ac")

        if not c.use_aux_heads:
            return main
        # aux heads are built unconditionally (param structure must not depend on
        # `train`); in eval they are not returned so XLA dead-code-eliminates them
        aux16 = SegmentationHead(c.aux_head_channels, c.num_classes, c.dropout, name="aux_head_s16")(feat16, train=train)
        aux16 = _upsample(aux16, 16, "bilinear_ac")
        aux32 = SegmentationHead(c.aux_head_channels, c.num_classes, c.dropout, name="aux_head_s32")(feat32, train=train)
        aux32 = _upsample(aux32, 32, "bilinear_ac")
        detail8 = SegmentationHead(c.detail_head_channels, 1, c.dropout, name="detail_head8")(feat8, train=train)
        detail8 = _upsample(detail8, 8, "bilinear_ac")
        if not train:
            return main
        return main, aux32, aux16, detail8
