"""PP-YOLOE S/M/L/X (flax, NHWC).

Reference: ``detection_models/csp_resnet.py`` (CSPResNetBasicBlock :21, CSPResStage
:52, CSPResNetBackbone :120), ``pp_yolo_e/pan.py`` (PPYoloESPP, CSPStage,
PPYoloECSPPAN :71-196), ``pp_yolo_e/pp_yolo_head.py`` (ESEAttn :79, PPYOLOEHead :95),
``pp_yolo_e/pp_yolo_e.py`` variants (S: w0.5/d0.33, M: w0.75/d0.67, L: 1/1, X:
1.25/1.33) with ``ppyoloe_arch_params.yaml`` channels.

Shares the detection output contract (``YoloNASOutputs``) so PPYoloELoss, the NMS
predict program and DetectionMetrics apply unchanged.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.detection.yolo_nas import YoloNASOutputs
from super_gradients_tpu.modules.blocks import ConvBNAct, RepVGGBlock
from super_gradients_tpu.ops.bbox import batch_distance2bbox


def _round(v, mult):
    return max(round(v * mult), 1)


class EffectiveSE(nn.Module):
    """EffectiveSEBlock (ref modules/se_blocks.py): y = x * hardsigmoid(fc(mean(x)))."""

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True, name="fc")(s)
        return x * nn.hard_sigmoid(s)


class CSPResNetBasicBlock(nn.Module):
    """ConvBNAct 3x3 + RepVGG block (+residual) (ref csp_resnet.py:21-50)."""

    out_channels: int
    act: str = "silu"
    use_residual: bool = True
    use_alpha: bool = False
    fused: str = "none"  # RepVGG deploy form (fuse_repvgg_params)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(out_channels=self.out_channels, kernel=3, act=self.act, name="conv1")(x, train=train)
        y = RepVGGBlock(out_channels=self.out_channels, act=self.act, use_residual=False, fused=self.fused, name="conv2")(y, train=train)
        return x + y if self.use_residual else y


class CSPResStage(nn.Module):
    """ref csp_resnet.py:52-115."""

    out_channels: int
    num_blocks: int
    stride: int
    act: str = "silu"
    use_attention: bool = True
    fused: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = (cin + self.out_channels) // 2
        half = mid // 2
        mid = 2 * half
        if self.stride != 1:
            x = ConvBNAct(out_channels=mid, kernel=3, stride=self.stride, act=self.act, name="conv_down")(x, train=train)
        y1 = ConvBNAct(out_channels=half, kernel=1, act=self.act, name="conv1")(x, train=train)
        y2 = ConvBNAct(out_channels=half, kernel=1, act=self.act, name="conv2")(x, train=train)
        for i in range(self.num_blocks):
            y2 = CSPResNetBasicBlock(half, self.act, use_residual=True, fused=self.fused, name=f"blocks_{i}")(y2, train=train)
        y = jnp.concatenate([y1, y2], axis=-1)
        if self.use_attention:
            y = EffectiveSE(name="attn")(y)
        return ConvBNAct(out_channels=self.out_channels, kernel=1, act=self.act, name="conv3")(y, train=train)


class CSPResNetBackbone(nn.Module):
    """ref csp_resnet.py:120-240 (use_large_stem=True)."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    layers: Tuple[int, ...] = (3, 6, 6, 3)
    channels: Tuple[int, ...] = (64, 128, 256, 512, 1024)
    return_idx: Tuple[int, ...] = (1, 2, 3)
    act: str = "silu"
    fused: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = [_round(c, self.width_mult) for c in self.channels]
        layers = [_round(l, self.depth_mult) for l in self.layers]
        conv = partial(ConvBNAct, act=self.act)
        x = conv(out_channels=ch[0] // 2, kernel=3, stride=2, name="stem_conv1")(x, train=train)
        x = conv(out_channels=ch[0] // 2, kernel=3, stride=1, name="stem_conv2")(x, train=train)
        x = conv(out_channels=ch[0], kernel=3, stride=1, name="stem_conv3")(x, train=train)
        outs = []
        for i, (c, n) in enumerate(zip(ch[1:], layers)):
            x = CSPResStage(c, n, stride=2, act=self.act, fused=self.fused, name=f"stages_{i}")(x, train=train)
            if i in self.return_idx:
                outs.append(x)
        return outs


class PPYoloESPP(nn.Module):
    """SPP inside the first CSP PAN stage (ref pan.py:14-40)."""

    out_channels: int
    kernel: int = 1
    pool_sizes: Tuple[int, ...] = (5, 9, 13)
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from super_gradients_tpu.ops.pooling import chained_max_pools

        y = jnp.concatenate((x,) + chained_max_pools(x, self.pool_sizes), axis=-1)  # exact; TPU-fast backward
        return ConvBNAct(out_channels=self.out_channels, kernel=self.kernel, act=self.act, name="conv")(y, train=train)


class CSPStage(nn.Module):
    """ref pan.py:43-67."""

    out_channels: int
    block_num: int
    spp: bool
    act: str = "silu"
    fused: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out_channels // 2
        y1 = ConvBNAct(out_channels=mid, kernel=1, act=self.act, name="conv1")(x, train=train)
        y2 = ConvBNAct(out_channels=mid, kernel=1, act=self.act, name="conv2")(x, train=train)
        for i in range(self.block_num):
            y2 = CSPResNetBasicBlock(mid, self.act, use_residual=False, fused=self.fused, name=f"convs_{i}")(y2, train=train)
            if i == (self.block_num - 1) // 2 and self.spp:
                y2 = PPYoloESPP(mid, act=self.act, name="convs_spp")(y2, train=train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBNAct(out_channels=self.out_channels, kernel=1, act=self.act, name="conv3")(y, train=train)


class PPYoloECSPPAN(nn.Module):
    """ref pan.py:71-196. Inputs [c3(s8), c4(s16), c5(s32)] -> outputs (s32, s16, s8)."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    in_channels: Tuple[int, ...] = (256, 512, 1024)
    out_channels: Tuple[int, ...] = (768, 384, 192)
    block_num: int = 3
    stage_num: int = 1
    spp: bool = True
    act: str = "silu"
    fused: str = "none"

    @nn.compact
    def __call__(self, blocks, train: bool = False):
        out_ch = [_round(c, self.width_mult) for c in self.out_channels]
        block_num = _round(self.block_num, self.depth_mult)
        n = len(blocks)
        blocks = blocks[::-1]  # top-down: c5, c4, c3
        fpn_feats = []
        route = None
        for i, block in enumerate(blocks):
            if i > 0:
                block = jnp.concatenate([route, block], axis=-1)
            x = block
            for j in range(self.stage_num):
                x = CSPStage(out_ch[i], block_num, spp=(self.spp and i == 0), act=self.act, fused=self.fused, name=f"fpn_stages_{i}_{j}")(x, train=train)
            fpn_feats.append(x)
            if i < n - 1:
                route = ConvBNAct(out_channels=out_ch[i] // 2, kernel=1, act=self.act, name=f"fpn_routes_{i}")(x, train=train)
                b, h, w, c = route.shape
                route = jax.image.resize(route, (b, h * 2, w * 2, c), method="nearest")

        pan_feats = [fpn_feats[-1]]
        route = fpn_feats[-1]
        for i in reversed(range(n - 1)):
            block = fpn_feats[i]
            route = ConvBNAct(out_channels=route.shape[-1], kernel=3, stride=2, act=self.act, name=f"pan_routes_{i}")(route, train=train)
            block = jnp.concatenate([route, block], axis=-1)
            x = block
            for j in range(self.stage_num):
                x = CSPStage(out_ch[i], block_num, spp=False, act=self.act, fused=self.fused, name=f"pan_stages_{i}_{j}")(x, train=train)
            pan_feats.append(x)
            route = x
        return pan_feats[::-1]  # (s32, s16, s8)


@dataclasses.dataclass(frozen=True)
class PPYoloEConfig:
    num_classes: int = 80
    width_mult: float = 1.0
    depth_mult: float = 1.0
    reg_max: int = 16
    grid_cell_offset: float = 0.5
    act: str = "silu"
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    fused: str = "none"  # RepVGG blocks in CSPResNet fuse for deploy


class PPYoloEHead(nn.Module):
    """ESE-attention head (ref pp_yolo_head.py:79-260)."""

    cfg: PPYoloEConfig
    strides: Tuple[int, ...] = (32, 16, 8)

    @nn.compact
    def __call__(self, feats, train: bool = False) -> YoloNASOutputs:
        c = self.cfg
        prior_bias = -math.log((1 - 0.01) / 0.01)
        cls_list, reg_list, dist_list, points, strides_t, num_anchors = [], [], [], [], [], []
        proj = jnp.arange(c.reg_max + 1, dtype=jnp.float32)

        for i, feat in enumerate(feats):
            b, hh, ww, cc = feat.shape
            avg = jnp.mean(feat, axis=(1, 2), keepdims=True)
            # ESEAttn stems
            w_cls = jax.nn.sigmoid(nn.Conv(cc, (1, 1), name=f"stem_cls_{i}_fc")(avg))
            cls_feat = ConvBNAct(out_channels=cc, kernel=1, act=c.act, name=f"stem_cls_{i}_conv")(feat * w_cls, train=train)
            cls_logit = nn.Conv(
                c.num_classes, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.constant(prior_bias),
                name=f"pred_cls_{i}",
            )(cls_feat + feat)
            w_reg = jax.nn.sigmoid(nn.Conv(cc, (1, 1), name=f"stem_reg_{i}_fc")(avg))
            reg_feat = ConvBNAct(out_channels=cc, kernel=1, act=c.act, name=f"stem_reg_{i}_conv")(feat * w_reg, train=train)
            reg_distri = nn.Conv(
                4 * (c.reg_max + 1), (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.ones,
                name=f"pred_reg_{i}",
            )(reg_feat)

            a = hh * ww
            cls_list.append(cls_logit.reshape(b, a, c.num_classes))
            reg_flat = reg_distri.reshape(b, a, 4 * (c.reg_max + 1))
            reg_list.append(reg_flat)
            prob = jax.nn.softmax(reg_flat.reshape(b, a, 4, c.reg_max + 1).astype(jnp.float32), axis=-1)
            dist_list.append(jnp.einsum("bank,k->ban", prob, proj))

            s = float(self.strides[i])
            sx = jnp.arange(ww, dtype=jnp.float32) + c.grid_cell_offset
            sy = jnp.arange(hh, dtype=jnp.float32) + c.grid_cell_offset
            gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
            points.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
            strides_t.append(jnp.full((a, 1), s, dtype=jnp.float32))
            num_anchors.append(a)

        cls_logits = jnp.concatenate(cls_list, 1)
        reg_distri = jnp.concatenate(reg_list, 1)
        distances = jnp.concatenate(dist_list, 1)
        pts = jnp.concatenate(points, 0)
        st = jnp.concatenate(strides_t, 0)
        pred_bboxes = batch_distance2bbox(pts[None], distances) * st[None]
        pred_scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        return YoloNASOutputs(
            pred_bboxes=pred_bboxes,
            pred_scores=pred_scores,
            cls_logits=cls_logits,
            reg_distri=reg_distri,
            anchor_points=pts,
            stride_tensor=st,
            num_anchors_list=tuple(num_anchors),
        )


class PPYoloE(nn.Module):
    """ref pp_yolo_e.py:102-441."""

    cfg: PPYoloEConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> YoloNASOutputs:
        c = self.cfg
        feats = CSPResNetBackbone(c.width_mult, c.depth_mult, act=c.act, fused=c.fused, name="backbone")(x, train=train)
        pan = PPYoloECSPPAN(c.width_mult, c.depth_mult, act=c.act, fused=c.fused, name="neck")(feats, train=train)
        return PPYoloEHead(c, name="head")(pan, train=train)


def ppyoloe_s_config(num_classes=80, **kw):
    return PPYoloEConfig(num_classes=num_classes, width_mult=0.5, depth_mult=0.33, **kw)


def ppyoloe_m_config(num_classes=80, **kw):
    return PPYoloEConfig(num_classes=num_classes, width_mult=0.75, depth_mult=0.67, **kw)


def ppyoloe_l_config(num_classes=80, **kw):
    return PPYoloEConfig(num_classes=num_classes, width_mult=1.0, depth_mult=1.0, **kw)


def ppyoloe_x_config(num_classes=80, **kw):
    return PPYoloEConfig(num_classes=num_classes, width_mult=1.25, depth_mult=1.33, **kw)
