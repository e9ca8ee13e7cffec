"""YOLOX family N/T/S/M/L (flax, NHWC).

Reference: ``detection_models/csp_darknet53.py`` (Conv/Bottleneck/CSPLayer/SPP/Focus)
+ ``yolo_base.py`` (YoloDarknetBackbone :316, YoloHead PAFPN :373, DetectX decoupled
head :180 — decode xy = (offset + grid) * stride, wh = exp(·) * stride) +
``yolox.py`` variants (N .33/.25, T .33/.375, S .33/.5, M .67/.75, L 1/1).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import ConvBNAct


def _w(c: int, width: float) -> int:
    return max(round(c * width), 1)


def _d(n: int, depth: float) -> int:
    return max(round(n * depth), 1)


class CSPLayer(nn.Module):
    """ref csp_darknet53.py:75-111."""

    out_channels: int
    n: int
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        conv = partial(ConvBNAct, act=self.act)
        y1 = conv(out_channels=hidden, kernel=1, name="conv1")(x, train=train)
        for i in range(self.n):
            z = conv(out_channels=hidden, kernel=1, name=f"b{i}_cv1")(y1, train=train)
            z = conv(out_channels=hidden, kernel=3, name=f"b{i}_cv2")(z, train=train)
            y1 = y1 + z if self.shortcut else z
        y2 = conv(out_channels=hidden, kernel=1, name="conv2")(x, train=train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return conv(out_channels=self.out_channels, kernel=1, name="conv3")(y, train=train)


class SPPBlock(nn.Module):
    out_channels: int
    k: Tuple[int, ...] = (5, 9, 13)
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        conv = partial(ConvBNAct, act=self.act)
        x = conv(out_channels=hidden, kernel=1, name="cv1")(x, train=train)
        from super_gradients_tpu.ops.pooling import chained_max_pools

        outs = (x,) + chained_max_pools(x, self.k)  # exact; TPU-fast backward (ops/pooling.py)
        return conv(out_channels=self.out_channels, kernel=1, name="cv2")(jnp.concatenate(outs, -1), train=train)


class CSPDarknet(nn.Module):
    """ref csp_darknet53.py CSPDarknet53 backbone in YOLOX config."""

    width: float = 1.0
    depth: float = 1.0
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(ConvBNAct, act=self.act)
        # 6x6/s2 stem conv (ref csp_darknet53.py:207 — the yoloX reparam of Focus)
        x = conv(out_channels=_w(64, self.width), kernel=6, stride=2, padding=2, name="stem")(x, train=train)
        x = conv(out_channels=_w(128, self.width), kernel=3, stride=2, name="dark2_conv")(x, train=train)
        x = CSPLayer(_w(128, self.width), _d(3, self.depth), act=self.act, name="dark2_csp")(x, train=train)
        x = conv(out_channels=_w(256, self.width), kernel=3, stride=2, name="dark3_conv")(x, train=train)
        c3 = CSPLayer(_w(256, self.width), _d(9, self.depth), act=self.act, name="dark3_csp")(x, train=train)
        x = conv(out_channels=_w(512, self.width), kernel=3, stride=2, name="dark4_conv")(c3, train=train)
        c4 = CSPLayer(_w(512, self.width), _d(9, self.depth), act=self.act, name="dark4_csp")(x, train=train)
        x = conv(out_channels=_w(1024, self.width), kernel=3, stride=2, name="dark5_conv")(c4, train=train)
        x = SPPBlock(_w(1024, self.width), act=self.act, name="dark5_spp")(x, train=train)
        c5 = CSPLayer(_w(1024, self.width), _d(3, self.depth), shortcut=False, act=self.act, name="dark5_csp")(x, train=train)
        return c3, c4, c5


class YoloXOutputs(NamedTuple):
    pred_bboxes: jnp.ndarray  # [B, A, 4] xyxy px
    pred_scores: jnp.ndarray  # [B, A, C] obj * cls (sigmoid)
    reg_raw: jnp.ndarray  # [B, A, 4] (dx, dy, logw, logh)
    obj_logits: jnp.ndarray  # [B, A]
    cls_logits: jnp.ndarray  # [B, A, C]
    anchor_points: jnp.ndarray  # [A, 2] grid coords (no +0.5 offset; YOLOX convention)
    stride_tensor: jnp.ndarray  # [A, 1]
    num_anchors_list: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class YoloXConfig:
    num_classes: int = 80
    width: float = 1.0
    depth: float = 1.0
    act: str = "silu"
    strides: Tuple[int, ...] = (8, 16, 32)


class YoloX(nn.Module):
    """Backbone + PAFPN + decoupled DetectX head (ref yolo_base.py:470-815)."""

    cfg: YoloXConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> YoloXOutputs:
        c = self.cfg
        conv = partial(ConvBNAct, act=c.act)
        c3, c4, c5 = CSPDarknet(c.width, c.depth, c.act, name="backbone")(x, train=train)

        w256, w512 = _w(256, c.width), _w(512, c.width)
        nrep = _d(3, c.depth)

        # top-down FPN
        lat5 = conv(out_channels=w512, kernel=1, name="lateral5")(c5, train=train)
        up5 = jax.image.resize(lat5, (lat5.shape[0], lat5.shape[1] * 2, lat5.shape[2] * 2, lat5.shape[3]), "nearest")
        f4 = CSPLayer(w512, nrep, shortcut=False, act=c.act, name="fpn_c4")(jnp.concatenate([up5, c4], -1), train=train)
        lat4 = conv(out_channels=w256, kernel=1, name="lateral4")(f4, train=train)
        up4 = jax.image.resize(lat4, (lat4.shape[0], lat4.shape[1] * 2, lat4.shape[2] * 2, lat4.shape[3]), "nearest")
        p3 = CSPLayer(w256, nrep, shortcut=False, act=c.act, name="fpn_c3")(jnp.concatenate([up4, c3], -1), train=train)

        # bottom-up PAN
        d3 = conv(out_channels=w256, kernel=3, stride=2, name="down3")(p3, train=train)
        p4 = CSPLayer(w512, nrep, shortcut=False, act=c.act, name="pan_c4")(jnp.concatenate([d3, lat4], -1), train=train)
        d4 = conv(out_channels=w512, kernel=3, stride=2, name="down4")(p4, train=train)
        p5 = CSPLayer(_w(1024, c.width), nrep, shortcut=False, act=c.act, name="pan_c5")(jnp.concatenate([d4, lat5], -1), train=train)

        # decoupled head (ref DetectX)
        inter = w256
        prior = -math.log((1 - 0.01) / 0.01)
        reg_list, obj_list, cls_list, points, strides_t, nums = [], [], [], [], [], []
        for i, feat in enumerate([p3, p4, p5]):
            b, hh, ww, _ = feat.shape
            s = conv(out_channels=inter, kernel=1, name=f"head{i}_stem")(feat, train=train)
            cf = conv(out_channels=inter, kernel=3, name=f"head{i}_cls1")(s, train=train)
            cf = conv(out_channels=inter, kernel=3, name=f"head{i}_cls2")(cf, train=train)
            cls_out = nn.Conv(c.num_classes, (1, 1), bias_init=nn.initializers.constant(prior), name=f"head{i}_cls_pred")(cf)
            rf = conv(out_channels=inter, kernel=3, name=f"head{i}_reg1")(s, train=train)
            rf = conv(out_channels=inter, kernel=3, name=f"head{i}_reg2")(rf, train=train)
            reg_out = nn.Conv(4, (1, 1), name=f"head{i}_reg_pred")(rf)
            obj_out = nn.Conv(1, (1, 1), bias_init=nn.initializers.constant(prior), name=f"head{i}_obj_pred")(rf)

            a = hh * ww
            reg_list.append(reg_out.reshape(b, a, 4))
            obj_list.append(obj_out.reshape(b, a))
            cls_list.append(cls_out.reshape(b, a, c.num_classes))
            gy, gx = jnp.meshgrid(jnp.arange(hh, dtype=jnp.float32), jnp.arange(ww, dtype=jnp.float32), indexing="ij")
            points.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
            strides_t.append(jnp.full((a, 1), float(c.strides[i]), jnp.float32))
            nums.append(a)

        reg_raw = jnp.concatenate(reg_list, 1).astype(jnp.float32)
        obj_logits = jnp.concatenate(obj_list, 1).astype(jnp.float32)
        cls_logits = jnp.concatenate(cls_list, 1).astype(jnp.float32)
        pts = jnp.concatenate(points, 0)
        st = jnp.concatenate(strides_t, 0)

        # decode (ref DetectX.forward eval branch)
        xy = (reg_raw[..., :2] + pts[None]) * st[None]
        wh = jnp.exp(jnp.clip(reg_raw[..., 2:4], -10, 8)) * st[None]
        boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        scores = jax.nn.sigmoid(obj_logits)[..., None] * jax.nn.sigmoid(cls_logits)
        return YoloXOutputs(boxes, scores, reg_raw, obj_logits, cls_logits, pts, st, tuple(nums))


YOLOX_VARIANTS = {
    "yolox_n": (0.33, 0.25),
    "yolox_t": (0.33, 0.375),
    "yolox_s": (0.33, 0.5),
    "yolox_m": (0.67, 0.75),
    "yolox_l": (1.0, 1.0),
}


def yolox_config(variant: str, num_classes: int = 80) -> YoloXConfig:
    depth, width = YOLOX_VARIANTS[variant]
    return YoloXConfig(num_classes=num_classes, width=width, depth=depth)
