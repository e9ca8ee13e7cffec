"""UNet + SegFormer (flax, NHWC).

Reference: ``segmentation_models/unet/`` (configurable encoder/decoder, 340+239+234
LoC) and ``segformer.py`` (MiT backbone: overlapping patch embed, efficient
self-attention with spatial-reduction, MixFFN; all-MLP decode head; B0-B5 configs).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import ConvBNAct


# ------------------------------------------------------------------------ UNet


@dataclasses.dataclass(frozen=True)
class UNetCfg:
    """Classic UNET assembly (recipes/arch_params/unet_arch_params.yaml over
    unet_default_arch_params.yaml): ConvStage encoder, UpCatBlock decoder."""

    num_classes: int = 19
    strides_list: Tuple[int, ...] = (1, 2, 2, 2, 2)
    width_list: Tuple[int, ...] = (64, 128, 256, 512, 512)
    num_blocks_list: Tuple[int, ...] = (2, 2, 2, 2, 2)
    decoder_scale: float = 0.5
    skip_expansion: float = 1.0
    up_block_repeat_list: Tuple[int, ...] = (2, 2, 2, 1)
    min_decoder_channels: int = 1
    final_upsample_factor: int = 1
    head_hidden_channels: int = 0  # 0 -> last decoder width (ref head_hidden_channels: null)
    dropout: float = 0.0


class UNet(nn.Module):
    """ref unet/unet.py:20-149 UNetBase (ConvStage + UpCatBlock configuration).

    Encoder: UNetBackboneBase (unet_encoder.py:226-272) of ConvStage stages —
    MaxPool2d(2) downsample (when stride 2, downsample_mode=max_pool) then
    ConvBNReLU blocks. Decoder (unet_decoder.py:165-240): per level, bilinear x2
    up (align_corners=False), concat skip (skip_expansion=1 -> identity
    projections), then `num_repeats` ConvBNReLUs. Head: SegmentationHead
    (common.py:5-15) = ConvBNReLU + dropout + 1x1 conv (bias=False)."""

    cfg: UNetCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        feats = []
        for i, (stride, w, nb) in enumerate(zip(c.strides_list, c.width_list, c.num_blocks_list)):
            if stride == 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for j in range(nb):
                x = ConvBNAct(out_channels=w, kernel=3, act="relu", name=f"stage{i}_blk{j}")(x, train=train)
            feats.append(x)

        up_channels = [max(int(ch * c.decoder_scale), c.min_decoder_channels) for ch in c.width_list]
        up_channels = up_channels[::-1][1:]

        if c.skip_expansion != 1.0:
            proj_ch = [max(int(ch * c.skip_expansion), c.min_decoder_channels) for ch in c.width_list]
            feats = [ConvBNAct(out_channels=pc, kernel=1, act="identity", name=f"proj{i}")(f, train=train)
                     for i, (f, pc) in enumerate(zip(feats, proj_ch))]

        skips = feats[::-1]
        x = skips[0]
        for i, (w, rep) in enumerate(zip(up_channels, c.up_block_repeat_list)):
            b, h, ww, cc = x.shape
            x = jax.image.resize(x, (b, h * 2, ww * 2, cc), "bilinear")
            if i + 1 < len(skips):
                x = jnp.concatenate([x, skips[i + 1]], axis=-1)
            for r in range(rep):
                x = ConvBNAct(out_channels=w, kernel=3, act="relu", name=f"dec{i}_conv{r}")(x, train=train)

        mid = c.head_hidden_channels or up_channels[-1]
        y = ConvBNAct(out_channels=mid, kernel=3, act="relu", name="head_conv")(x, train=train)
        if c.dropout > 0:
            y = nn.Dropout(c.dropout, deterministic=not train)(y)
        y = nn.Conv(c.num_classes, (1, 1), use_bias=False, name="head_pred")(y)
        if c.final_upsample_factor > 1:
            b, h, ww, cc = y.shape
            y = jax.image.resize(y, (b, h * c.final_upsample_factor, ww * c.final_upsample_factor, cc), "bilinear")
        return y


# -------------------------------------------------------------------- SegFormer


class EfficientSelfAttention(nn.Module):
    """Spatial-reduction attention (ref segformer.py:67)."""

    dim: int
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        b, n, d = x.shape
        h, w = hw
        q = nn.Dense(d, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            xm = x.reshape(b, h, w, d)
            xm = nn.Conv(d, (self.sr_ratio, self.sr_ratio), strides=(self.sr_ratio, self.sr_ratio), name="sr")(xm)
            kv_in = nn.LayerNorm(name="sr_norm")(xm.reshape(b, -1, d))
        # fused kv projection — the reference layout (segformer.py:82 self.kv) and
        # one [N,D]x[D,2D] matmul instead of two
        hd = d // self.heads
        kv = nn.Dense(2 * d, name="kv")(kv_in).reshape(b, -1, 2, self.heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]
        q = q.reshape(b, -1, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, d)
        return nn.Dense(d, name="proj")(out)


class MixFFN(nn.Module):
    """MLP with a 3x3 depthwise conv (ref segformer.py:108)."""

    dim: int
    expansion: int = 4

    @nn.compact
    def __call__(self, x, hw, train: bool = False):
        b, n, d = x.shape
        h, w = hw
        hidden = d * self.expansion
        y = nn.Dense(hidden, name="fc1")(x)
        ym = y.reshape(b, h, w, hidden)
        ym = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=hidden, name="dwconv")(ym)
        y = nn.gelu(ym.reshape(b, n, hidden))
        return nn.Dense(d, name="fc2")(y)


class UNetClassifier(nn.Module):
    """UNet encoder + GAP classifier head (ref unet/unet_encoder.py backbone used
    by ``unet_custom_cls``)."""

    cfg: UNetCfg
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, w in enumerate(self.cfg.width_list):
            if self.cfg.strides_list[i] == 2:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = ConvBNAct(out_channels=w, kernel=3, act="relu", name=f"enc{i}_1")(x, train=train)
            x = ConvBNAct(out_channels=w, kernel=3, act="relu", name=f"enc{i}_2")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)


@dataclasses.dataclass(frozen=True)
class SegFormerCfg:
    num_classes: int = 19
    embed_dims: Tuple[int, ...] = (32, 64, 160, 256)  # B0
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    decoder_dim: int = 256


SEGFORMER_B0 = SegFormerCfg()
SEGFORMER_B1 = SegFormerCfg(embed_dims=(64, 128, 320, 512))
SEGFORMER_B2 = SegFormerCfg(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3), decoder_dim=768)
SEGFORMER_B3 = SegFormerCfg(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3), decoder_dim=768)
SEGFORMER_B4 = SegFormerCfg(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3), decoder_dim=768)
SEGFORMER_B5 = SegFormerCfg(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3), decoder_dim=768)


class SegFormer(nn.Module):
    """MiT encoder + all-MLP head (ref segformer.py:163-490)."""

    cfg: SegFormerCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        b = x.shape[0]
        in_h, in_w = x.shape[1], x.shape[2]
        feats = []
        for si, (dim, depth, heads, sr) in enumerate(zip(c.embed_dims, c.depths, c.heads, c.sr_ratios)):
            patch, stride = (7, 4) if si == 0 else (3, 2)
            p = patch // 2
            x = nn.Conv(dim, (patch, patch), strides=(stride, stride), padding=((p, p), (p, p)), name=f"patch_embed{si}")(x)
            h, w = x.shape[1], x.shape[2]
            t = nn.LayerNorm(name=f"embed_norm{si}")(x.reshape(b, -1, dim))
            for bi in range(depth):
                t = t + EfficientSelfAttention(dim, heads, sr, name=f"attn{si}_{bi}")(
                    nn.LayerNorm(name=f"norm1_{si}_{bi}")(t), (h, w), train=train
                )
                t = t + MixFFN(dim, name=f"ffn{si}_{bi}")(nn.LayerNorm(name=f"norm2_{si}_{bi}")(t), (h, w), train=train)
            t = nn.LayerNorm(name=f"out_norm{si}")(t)
            x = t.reshape(b, h, w, dim)
            feats.append(x)

        # all-MLP decode head: project each stage to decoder_dim, upsample to 1/4, fuse
        target_h, target_w = feats[0].shape[1], feats[0].shape[2]
        ups = []
        for si, f in enumerate(feats):
            y = nn.Dense(c.decoder_dim, name=f"linear_c{si}")(f)
            if y.shape[1] != target_h:
                y = jax.image.resize(y, (b, target_h, target_w, c.decoder_dim), "bilinear")
            ups.append(y)
        y = jnp.concatenate(ups[::-1], axis=-1)
        y = ConvBNAct(out_channels=c.decoder_dim, kernel=1, act="relu", name="linear_fuse")(y, train=train)
        y = nn.Conv(c.num_classes, (1, 1), name="linear_pred")(y)
        return jax.image.resize(y, (b, in_h, in_w, c.num_classes), "bilinear")
