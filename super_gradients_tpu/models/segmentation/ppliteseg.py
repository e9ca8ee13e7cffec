"""PP-LiteSeg T/B (flax, NHWC).

Reference: ``segmentation_models/ppliteseg.py`` — UAFM (:18), PPLiteSegEncoder (:72),
PPLiteSegDecoder (:109), PPLiteSegBase (:144), B/T variant configs (:324-380);
SPPM from ``context_modules.py:19``. Backbone: STDC1 (T) / STDC2 (B) with
out_down_ratios (8, 16, 32). Bilinear upsampling with align_corners=False matches
``jax.image.resize(method='bilinear')`` semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.segmentation.stdc import (
    STDC1_CFG,
    STDC2_CFG,
    STDCBackbone,
    STDCBackboneCfg,
    SegmentationHead,
    _upsample,
)
from super_gradients_tpu.modules.blocks import ConvBNAct


class SPPM(nn.Module):
    """Simple Pyramid Pooling Module (ref context_modules.py:19-62)."""

    inter_channels: int
    out_channels: int
    pool_sizes: Tuple[int, ...] = (1, 2, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        out = None
        for i, ps in enumerate(self.pool_sizes):
            y = _adaptive_avg_pool(x, ps)
            y = ConvBNAct(out_channels=self.inter_channels, kernel=1, act="relu", name=f"branch_{i}")(y, train=train)
            y = jax.image.resize(y, (b, h, w, self.inter_channels), method="bilinear")
            out = y if out is None else out + y
        return ConvBNAct(out_channels=self.out_channels, kernel=3, act="relu", name="conv_out")(out, train=train)


def _adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d analogue (exact for divisible sizes, resize fallback)."""
    b, h, w, c = x.shape
    if out_size == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if h >= out_size and w >= out_size and h % out_size == 0 and w % out_size == 0:
        kh, kw = h // out_size, w // out_size
        return nn.avg_pool(x, (kh, kw), strides=(kh, kw))
    return jax.image.resize(x, (b, out_size, out_size, c), method="linear")


class UAFM(nn.Module):
    """Unified Attention Fusion Module (ref ppliteseg.py:18-69)."""

    in_channels: int
    out_channels: int
    up_factor: int

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        if self.up_factor != 1:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * self.up_factor, w * self.up_factor, c), method="bilinear")
        if skip.shape[-1] != self.in_channels:
            skip = ConvBNAct(out_channels=self.in_channels, kernel=3, act="relu", name="proj_skip")(skip, train=train)
        atten = jnp.concatenate(
            [
                jnp.mean(x, axis=-1, keepdims=True),
                jnp.max(x, axis=-1, keepdims=True),
                jnp.mean(skip, axis=-1, keepdims=True),
                jnp.max(skip, axis=-1, keepdims=True),
            ],
            axis=-1,
        )
        atten = ConvBNAct(out_channels=2, kernel=3, act="relu", name="conv_atten_0")(atten, train=train)
        atten = ConvBNAct(out_channels=1, kernel=3, act="identity", name="conv_atten_1")(atten, train=train)
        atten = jax.nn.sigmoid(atten)
        out = x * atten + skip * (1 - atten)
        return ConvBNAct(out_channels=self.out_channels, kernel=3, act="relu", name="conv_out")(out, train=train)


@dataclasses.dataclass(frozen=True)
class PPLiteSegCfg:
    backbone: STDCBackboneCfg = STDC1_CFG
    num_classes: int = 19
    projection_channels: Tuple[int, ...] = (64, 128, 128)
    sppm_inter_channels: int = 128
    sppm_out_channels: int = 128
    sppm_pool_sizes: Tuple[int, ...] = (1, 2, 4)
    decoder_up_factors: Tuple[int, ...] = (1, 2, 2)
    decoder_channels: Tuple[int, ...] = (128, 64, 32)
    head_mid_channels: int = 32
    dropout: float = 0.0
    use_aux_heads: bool = False
    aux_hidden_channels: Tuple[int, ...] = (32, 64, 64)
    aux_scale_factors: Tuple[int, ...] = (8, 16, 32)


PP_LITE_T_CFG = PPLiteSegCfg()
PP_LITE_B_CFG = PPLiteSegCfg(
    backbone=STDC2_CFG,
    projection_channels=(96, 128, 128),
    decoder_channels=(128, 96, 64),
    head_mid_channels=64,
)


class PPLiteSeg(nn.Module):
    """ref PPLiteSegBase (ppliteseg.py:144-318)."""

    cfg: PPLiteSegCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        feats = STDCBackbone(c.backbone, name="backbone")(x, train=train)  # f8, f16, f32
        context = SPPM(c.sppm_inter_channels, c.sppm_out_channels, c.sppm_pool_sizes, name="context")(feats[-1], train=train)
        projected = [
            ConvBNAct(out_channels=pc, kernel=3, act="relu", name=f"proj_{i}")(f, train=train)
            for i, (f, pc) in enumerate(zip(feats, c.projection_channels))
        ]
        # decode: context → fuse f32 → f16 → f8
        y = context
        skips = list(reversed(projected))
        in_ch = c.sppm_out_channels
        for i, (skip, up, out_ch) in enumerate(zip(skips, c.decoder_up_factors, c.decoder_channels)):
            y = UAFM(in_channels=in_ch, out_channels=out_ch, up_factor=up, name=f"up_stage_{i}")(y, skip, train=train)
            in_ch = out_ch
        main = SegmentationHead(c.head_mid_channels, c.num_classes, c.dropout, name="seg_head")(y, train=train)
        main = _upsample(main, 8, "bilinear")

        if not c.use_aux_heads:
            return main
        aux_outs = []
        for i, (f, hid, sf) in enumerate(zip(feats, c.aux_hidden_channels, c.aux_scale_factors)):
            a = SegmentationHead(hid, c.num_classes, c.dropout, name=f"aux_head_{i}")(f, train=train)
            aux_outs.append(_upsample(a, sf, "bilinear"))
        if not train:
            return main
        return tuple([main] + aux_outs)
