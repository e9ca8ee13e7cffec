"""DPN, PNASNet (CIFAR variants, as in the reference) and BEiT.

Reference: ``classification_models/dpn.py`` (:15-90, dual-path bottlenecks with
grouped 3x3 and residual+dense split), ``pnasnet.py`` (:13-110, SepConv cells),
``beit.py`` (ViT with per-block LayerScale and mean-pooled head).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.modules.blocks import ConvBNAct


class DPNBottleneck(nn.Module):
    """Dual-path bottleneck (ref dpn.py:15-42)."""

    in_planes: int
    out_planes: int
    dense_depth: int
    stride: int
    first_layer: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dense_depth
        y = ConvBNAct(out_channels=self.in_planes, kernel=1, act="relu", name="conv1")(x, train=train)
        y = ConvBNAct(out_channels=self.in_planes, kernel=3, stride=self.stride, groups=32, act="relu", name="conv2")(y, train=train)
        y = ConvBNAct(out_channels=self.out_planes + d, kernel=1, act="identity", name="conv3")(y, train=train)
        if self.first_layer:
            sc = ConvBNAct(out_channels=self.out_planes + d, kernel=1, stride=self.stride, act="identity", name="shortcut")(x, train=train)
        else:
            sc = x
        residual = sc[..., : self.out_planes] + y[..., : self.out_planes]
        dense = jnp.concatenate([sc[..., self.out_planes :], y[..., self.out_planes :]], axis=-1)
        return nn.relu(jnp.concatenate([residual, dense], axis=-1))


class DPN(nn.Module):
    """CIFAR DPN (ref dpn.py:45; DPN26/92 configs)."""

    num_classes: int = 10
    in_planes: Tuple[int, ...] = (96, 192, 384, 768)
    out_planes: Tuple[int, ...] = (256, 512, 1024, 2048)
    num_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    dense_depth: Tuple[int, ...] = (16, 32, 24, 128)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=64, kernel=3, act="relu", name="stem")(x, train=train)
        for li in range(4):
            for bi in range(self.num_blocks[li]):
                x = DPNBottleneck(
                    self.in_planes[li], self.out_planes[li], self.dense_depth[li],
                    stride=(1 if li == 0 else 2) if bi == 0 else 1,
                    first_layer=bi == 0, name=f"layer{li + 1}_{bi}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="linear")(x)


def dpn26_kwargs():
    return dict(in_planes=(96, 192, 384, 768), out_planes=(256, 512, 1024, 2048), num_blocks=(2, 2, 2, 2), dense_depth=(16, 32, 24, 128))


def dpn92_kwargs():
    return dict(in_planes=(96, 192, 384, 768), out_planes=(256, 512, 1024, 2048), num_blocks=(3, 4, 20, 3), dense_depth=(16, 32, 24, 128))


class SepConv(nn.Module):
    """Depthwise-separable conv with BN (ref pnasnet.py:13-22)."""

    out_channels: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        p = (self.kernel - 1) // 2
        y = nn.Conv(self.out_channels, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), feature_group_count=cin,
                    use_bias=False, name="conv")(x)
        return nn.BatchNorm(use_running_average=not train, name="bn")(y)


class CellA(nn.Module):
    """ref pnasnet.py:25-39."""

    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = SepConv(self.out_channels, 7, self.stride, name="sep")(x, train=train)
        if self.stride == 2:
            y2 = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            y2 = nn.max_pool(y2, (3, 3), strides=(2, 2))
        else:
            y2 = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            y2 = nn.max_pool(y2, (3, 3), strides=(1, 1))
        if y2.shape[-1] != self.out_channels:
            y2 = ConvBNAct(out_channels=self.out_channels, kernel=1, act="identity", name="proj")(y2, train=train)
        return nn.relu(y1 + y2)


class PNASNet(nn.Module):
    """CIFAR PNASNetA (ref pnasnet.py:74-110)."""

    num_classes: int = 10
    num_cells: int = 6
    num_planes: int = 44

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.num_planes
        x = ConvBNAct(out_channels=p, kernel=3, act="relu", name="stem")(x, train=train)
        for i in range(self.num_cells):
            x = CellA(p, 1, name=f"cells1_{i}")(x, train=train)
        x = CellA(p * 2, 2, name="down1")(x, train=train)
        for i in range(self.num_cells):
            x = CellA(p * 2, 1, name=f"cells2_{i}")(x, train=train)
        x = CellA(p * 4, 2, name="down2")(x, train=train)
        for i in range(self.num_cells):
            x = CellA(p * 4, 1, name=f"cells3_{i}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="linear")(x)


def gen_relative_position_index(window_size) -> np.ndarray:
    """Static [A+1, A+1] index into the relative-position-bias table
    (ref beit.py:141-164; A = Wh*Ww patches + cls token rows/cols)."""
    wh, ww = window_size
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))  # [2, Wh, Ww]
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0).astype(np.int64)  # [A, A, 2]
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    area = wh * ww
    index = np.zeros((area + 1, area + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel - 3
    index[0:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index


class BEiTAttention(nn.Module):
    """BEiT attention: shared qkv projection with q/v-only bias and windowed
    relative-position bias added to the logits (ref beit.py:165-233 Attention)."""

    dim: int
    heads: int
    window_size: tuple  # (Wh, Ww) patch grid

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, _ = x.shape
        head_dim = self.dim // self.heads
        scale = head_dim**-0.5
        q_bias = self.param("q_bias", nn.initializers.zeros, (self.dim,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (self.dim,))
        qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])  # k has no bias
        qkv = nn.Dense(3 * self.dim, use_bias=False, name="qkv")(x) + qkv_bias
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = q @ k.transpose(0, 1, 3, 2)  # [B, H, N, N]

        wh, ww = self.window_size
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param("relative_position_bias_table", nn.initializers.zeros, (num_rel, self.heads))
        index = jnp.asarray(gen_relative_position_index(self.window_size))  # [A+1, A+1] static
        bias = table[index.reshape(-1)].reshape(n, n, self.heads).transpose(2, 0, 1)
        attn = attn + bias[None]

        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class BEiTBlock(nn.Module):
    """Transformer block with LayerScale + rel-pos attention (ref beit.py Block)."""

    dim: int
    heads: int
    window_size: tuple
    mlp_ratio: float = 4.0
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        g1 = self.param("gamma_1", nn.initializers.constant(self.init_scale), (self.dim,))
        g2 = self.param("gamma_2", nn.initializers.constant(self.init_scale), (self.dim,))
        h = nn.LayerNorm(name="norm1")(x)
        h = BEiTAttention(self.dim, self.heads, self.window_size, name="attn")(h, train=train)
        x = x + g1 * h
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = nn.Dense(self.dim, name="fc2")(nn.gelu(h))
        return x + g2 * h


class BEiT(nn.Module):
    """BEiT-base/large fine-tune architecture (ref beit.py: patch embed, LayerScale
    blocks, mean-pooled classification head)."""

    num_classes: int = 1000
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        p = self.patch_size
        wh, ww = x.shape[1] // p, x.shape[2] // p
        x = nn.Conv(self.dim, (p, p), strides=(p, p), name="patch_embed")(x)
        x = x.reshape(b, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        for i in range(self.depth):
            x = BEiTBlock(self.dim, self.heads, (wh, ww), name=f"block_{i}")(x, train=train)
        # mean-pool FIRST, then fc_norm (ref beit.py:437-441 forward_head with
        # global_pool='avg': norm is Identity, fc_norm applies to the pooled token)
        pooled = jnp.mean(x[:, 1:], axis=1)
        pooled = nn.LayerNorm(name="fc_norm")(pooled)
        return nn.Dense(self.num_classes, name="head")(pooled)
