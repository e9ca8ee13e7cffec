"""YOLO-NAS S/M/L — TPU-native flax implementation.

Reference architecture: ``training/models/detection_models/yolo_nas/``
(``yolo_stages.py:23-395``, ``panneck.py``, ``dfl_heads.py:113-283``,
``yolo_nas_variants.py:149-214``) and the arch-params YAMLs
(``recipes/arch_params/yolo_nas_{s,m,l}_arch_params.yaml``). Channel configs are kept
identical so reference checkpoints convert weight-for-weight; the implementation is
NHWC flax with static-shape decode (anchors generated at trace time from feature
shapes) and the DFL projection expressed as a fused softmax-matmul.

Forward returns :class:`YoloNASOutputs` with both decoded predictions (for the fused
predict+NMS program) and raw logits + anchor metadata (for PPYoloELoss) — the analogue
of the reference's ``(decoded_predictions, raw_predictions)`` tuple.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.modules.blocks import (
    ConvBNAct,
    ConvTranspose2x2,
    QARepVGGBlock,
    get_activation,
    width_multiplier,
)
from super_gradients_tpu.ops.bbox import batch_distance2bbox


# --------------------------------------------------------------------- configs


@dataclasses.dataclass(frozen=True)
class StageCfg:
    out_channels: int
    num_blocks: int
    hidden_channels: int
    concat_intermediates: bool = False
    act: str = "relu"


@dataclasses.dataclass(frozen=True)
class UpStageCfg:
    out_channels: int
    num_blocks: int
    hidden_channels: int
    width_mult: float = 1.0
    depth_mult: float = 1.0
    reduce_channels: bool = True
    act: str = "relu"


@dataclasses.dataclass(frozen=True)
class DownStageCfg:
    out_channels: int
    num_blocks: int
    hidden_channels: int
    width_mult: float = 1.0
    depth_mult: float = 1.0
    act: str = "relu"


@dataclasses.dataclass(frozen=True)
class HeadCfg:
    inter_channels: int
    width_mult: float
    stride: int
    first_conv_group_size: int = 0


@dataclasses.dataclass(frozen=True)
class YoloNASConfig:
    """Full architecture config (mirrors yolo_nas_*_arch_params.yaml)."""

    stem_channels: int
    stages: Tuple[StageCfg, ...]
    spp_channels: int
    spp_k: Tuple[int, ...]
    neck1: UpStageCfg
    neck2: UpStageCfg
    neck3: DownStageCfg
    neck4: DownStageCfg
    heads: Tuple[HeadCfg, ...]
    num_classes: int = 80
    reg_max: int = 16
    in_channels: int = 3
    bn_eps: float = 1e-3
    bn_momentum: float = 0.03
    grid_cell_offset: float = 0.5
    fused: str = "none"  # propagated to every QARepVGG block
    # Deploy-only stem form: space-to-depth(2x2) input + equivalent 2x2 conv.
    # The stride-2 3x3 stem conv on a 3-channel image uses 3 of the MXU's 128
    # lanes (~4% utilization on v5e); the mathematically identical s2d form
    # (input [H/2,W/2,12], kernel 2x2) raises the contraction to 48 lanes.
    # Weights are derived from the trained 3x3 stem by
    # :func:`s2d_stem_params` — requires ``fused='full'``.
    stem_s2d: bool = False


# ---------------------------------------------------------------- core layers


class YoloNASBottleneck(nn.Module):
    """Two conv blocks + optional alpha-weighted residual (ref yolo_stages.py:23-64)."""

    out_channels: int
    block: Any  # callable (out_channels, name) -> nn.Module
    shortcut: bool
    use_alpha: bool
    in_equals_out: bool

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = self.block(self.out_channels, name="cv1")(x, train=train)
        y = self.block(self.out_channels, name="cv2")(y, train=train)
        if self.shortcut and self.in_equals_out:
            if self.use_alpha:
                alpha = self.param("alpha", nn.initializers.ones, (1,))
                return alpha * x + y
            return x + y
        return y


class YoloNASCSPLayer(nn.Module):
    """Cross-stage layer (ref yolo_stages.py:88-152)."""

    out_channels: int
    num_bottlenecks: int
    block: Any
    hidden_channels: int
    act: str
    bn_eps: float
    bn_momentum: float
    shortcut: bool = True
    use_alpha: bool = True
    concat_intermediates: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(ConvBNAct, kernel=1, stride=1, act=self.act, bn_eps=self.bn_eps, bn_momentum=self.bn_momentum)
        h = self.hidden_channels
        x1 = conv(out_channels=h, name="conv1")(x, train=train)
        intermediates = [x1]
        for i in range(self.num_bottlenecks):
            x1 = YoloNASBottleneck(
                h, self.block, self.shortcut, self.use_alpha, in_equals_out=True, name=f"bottlenecks_{i}"
            )(x1, train=train)
            intermediates.append(x1)
        x2 = conv(out_channels=h, name="conv2")(x, train=train)
        if self.concat_intermediates:
            feats = intermediates + [x2]
        else:
            feats = [intermediates[-1], x2]
        y = jnp.concatenate(feats, axis=-1)
        return conv(out_channels=self.out_channels, name="conv3")(y, train=train)


class SPP(nn.Module):
    """Spatial pyramid pooling (ref csp_darknet53.py:136-157)."""

    out_channels: int
    k: Tuple[int, ...]
    act: str
    bn_eps: float
    bn_momentum: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        conv = partial(ConvBNAct, kernel=1, stride=1, act=self.act, bn_eps=self.bn_eps, bn_momentum=self.bn_momentum)
        x = conv(out_channels=hidden, name="cv1")(x, train=train)
        # chained 5x5 pools + vectorized-backward custom VJP (exact; see
        # ops/pooling.py — select-and-scatter was 7% of the b96 train step)
        from super_gradients_tpu.ops.pooling import chained_max_pools

        y = jnp.concatenate((x,) + chained_max_pools(x, self.k), axis=-1)
        return conv(out_channels=self.out_channels, name="cv2")(y, train=train)


def _qarep(cfg: YoloNASConfig, act: str):
    """QARepVGG block factory with the (out_channels, name=...) interface used by
    bottlenecks (in-CSP blocks are stride-1, residual, no alpha)."""
    return partial(
        QARepVGGBlock,
        act=act,
        use_residual=True,
        use_alpha=False,
        bn_eps=cfg.bn_eps,
        bn_momentum=cfg.bn_momentum,
        fused=cfg.fused,
    )


class YoloNASStem(nn.Module):
    """Single stride-2 QARepVGG block (ref yolo_stages.py:155-183)."""

    cfg: YoloNASConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.cfg.stem_s2d:
            # x arrives in s2d(2x2) form [B, H/2, W/2, 4*C]; the 2x2 stride-1 conv
            # with top/left pad 1 is bit-equivalent to the original 3x3 stride-2
            # conv (weights transformed by s2d_stem_params).
            from super_gradients_tpu.modules.blocks import get_activation

            y = nn.Conv(
                self.cfg.stem_channels, (2, 2), strides=(1, 1),
                padding=((1, 0), (1, 0)), use_bias=True, name="rbr_reparam_s2d",
            )(x)
            return get_activation("relu")(y)
        return QARepVGGBlock(
            out_channels=self.cfg.stem_channels, stride=2, use_residual=False,
            bn_eps=self.cfg.bn_eps, bn_momentum=self.cfg.bn_momentum, fused=self.cfg.fused, name="conv",
        )(x, train=train)


class YoloNASStage(nn.Module):
    """Downsample QARepVGG + CSP layer (ref yolo_stages.py:186-236)."""

    cfg: YoloNASConfig
    stage: StageCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        s = self.stage
        x = QARepVGGBlock(
            out_channels=s.out_channels, stride=2, act=s.act, use_residual=False,
            bn_eps=c.bn_eps, bn_momentum=c.bn_momentum, fused=c.fused, name="downsample",
        )(x, train=train)
        return YoloNASCSPLayer(
            out_channels=s.out_channels,
            num_bottlenecks=s.num_blocks,
            block=_qarep(c, s.act),
            hidden_channels=s.hidden_channels,
            act=s.act,
            bn_eps=c.bn_eps,
            bn_momentum=c.bn_momentum,
            concat_intermediates=s.concat_intermediates,
            name="blocks",
        )(x, train=train)


class YoloNASUpStage(nn.Module):
    """Upsample stage with 2 skips (ref yolo_stages.py:239-337, 3-input form)."""

    cfg: YoloNASConfig
    stage: UpStageCfg

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        c, s = self.cfg, self.stage
        out = width_multiplier(s.out_channels, s.width_mult, 8)
        num_blocks = max(round(s.num_blocks * s.depth_mult), 1) if s.num_blocks > 1 else s.num_blocks
        conv1 = partial(ConvBNAct, kernel=1, stride=1, act=s.act, bn_eps=c.bn_eps, bn_momentum=c.bn_momentum)

        x, skip_x1, skip_x2 = inputs
        if s.reduce_channels:
            skip_x1 = conv1(out_channels=out, name="reduce_skip1")(skip_x1, train=train)
            skip_x2 = conv1(out_channels=out, name="reduce_skip2")(skip_x2, train=train)
        skip_x2 = ConvBNAct(
            out_channels=out, kernel=3, stride=2, act=s.act, bn_eps=c.bn_eps, bn_momentum=c.bn_momentum,
            name="downsample",
        )(skip_x2, train=train)

        x_inter = conv1(out_channels=out, name="conv")(x, train=train)
        x_up = ConvTranspose2x2(out_channels=out, name="upsample")(x_inter)
        y = jnp.concatenate([x_up, skip_x1, skip_x2], axis=-1)
        if s.reduce_channels:
            y = conv1(out_channels=out, name="reduce_after_concat")(y, train=train)
        y = YoloNASCSPLayer(
            out_channels=out,
            num_bottlenecks=num_blocks,
            block=_qarep(c, s.act),
            hidden_channels=s.hidden_channels,
            act=s.act,
            bn_eps=c.bn_eps,
            bn_momentum=c.bn_momentum,
            name="blocks",
        )(y, train=train)
        return x_inter, y


class YoloNASDownStage(nn.Module):
    """Downsample stage (ref yolo_stages.py:340-395)."""

    cfg: YoloNASConfig
    stage: DownStageCfg

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        c, s = self.cfg, self.stage
        out = width_multiplier(s.out_channels, s.width_mult, 8)
        num_blocks = max(round(s.num_blocks * s.depth_mult), 1) if s.num_blocks > 1 else s.num_blocks
        x, skip_x = inputs
        x = ConvBNAct(
            out_channels=out // 2, kernel=3, stride=2, act=s.act, bn_eps=c.bn_eps, bn_momentum=c.bn_momentum,
            name="conv",
        )(x, train=train)
        y = jnp.concatenate([x, skip_x], axis=-1)
        return YoloNASCSPLayer(
            out_channels=out,
            num_bottlenecks=num_blocks,
            block=partial(ConvBNAct, kernel=3, stride=1, act=s.act, bn_eps=c.bn_eps, bn_momentum=c.bn_momentum),
            hidden_channels=s.hidden_channels,
            act=s.act,
            bn_eps=c.bn_eps,
            bn_momentum=c.bn_momentum,
            name="blocks",
        )(y, train=train)


class NStageBackbone(nn.Module):
    """Stem + 4 stages + SPP; returns (c2, c3, c4, c5) (ref nstage_backbone.py)."""

    cfg: YoloNASConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        if c.stem_s2d:
            b, h, w, ch = x.shape
            # space-to-depth(2x2): [B,H,W,C] -> [B,H/2,W/2,4C], channel = (p*2+q)*C+c
            x = x.reshape(b, h // 2, 2, w // 2, 2, ch).transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * ch)
        x = YoloNASStem(c, name="stem")(x, train=train)
        outs = []
        for i, stage in enumerate(c.stages):
            x = YoloNASStage(c, stage, name=f"stage{i + 1}")(x, train=train)
            outs.append(x)
        x = SPP(
            out_channels=c.spp_channels, k=c.spp_k, act="relu", bn_eps=c.bn_eps, bn_momentum=c.bn_momentum,
            name="context_module",
        )(outs[-1], train=train)
        # out_layers: stage1, stage2, stage3, context_module
        return outs[0], outs[1], outs[2], x


class YoloNASPANNeckWithC2(nn.Module):
    """PAN neck, 2 up + 2 down stages with C2 skip (ref panneck.py:13-66)."""

    cfg: YoloNASConfig

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2, c3, c4, c5 = feats
        cfg = self.cfg
        x_n1_inter, x = YoloNASUpStage(cfg, cfg.neck1, name="neck1")([c5, c4, c3], train=train)
        x_n2_inter, p3 = YoloNASUpStage(cfg, cfg.neck2, name="neck2")([x, c3, c2], train=train)
        p4 = YoloNASDownStage(cfg, cfg.neck3, name="neck3")([p3, x_n2_inter], train=train)
        p5 = YoloNASDownStage(cfg, cfg.neck4, name="neck4")([p4, x_n1_inter], train=train)
        return p3, p4, p5


class YoloNASDFLHead(nn.Module):
    """Per-level DFL head (ref dfl_heads.py:21-112)."""

    cfg: YoloNASConfig
    head: HeadCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c, h = self.cfg, self.head
        inter = width_multiplier(h.inter_channels, h.width_mult, 8)
        conv = partial(ConvBNAct, act="relu", bn_eps=c.bn_eps, bn_momentum=c.bn_momentum)
        x = conv(out_channels=inter, kernel=1, stride=1, name="stem")(x, train=train)

        cls_feat = conv(out_channels=inter, kernel=3, stride=1, name="cls_convs")(x, train=train)
        prior_bias = -math.log((1 - 0.01) / 0.01)
        cls_out = nn.Conv(
            c.num_classes, (1, 1), use_bias=True,
            bias_init=nn.initializers.constant(prior_bias), name="cls_pred",
        )(cls_feat)

        reg_feat = conv(out_channels=inter, kernel=3, stride=1, name="reg_convs")(x, train=train)
        reg_out = nn.Conv(4 * (c.reg_max + 1), (1, 1), use_bias=True, name="reg_pred")(reg_feat)
        return reg_out, cls_out


class YoloNASOutputs(NamedTuple):
    """Decoded + raw outputs (analogue of ref NDFLHeads.forward return)."""

    pred_bboxes: jnp.ndarray  # [B, A, 4] xyxy in input-image pixels
    pred_scores: jnp.ndarray  # [B, A, C] sigmoid scores
    cls_logits: jnp.ndarray  # [B, A, C]
    reg_distri: jnp.ndarray  # [B, A, 4*(reg_max+1)]
    anchor_points: jnp.ndarray  # [A, 2] grid-cell centers (stride units)
    stride_tensor: jnp.ndarray  # [A, 1]
    num_anchors_list: Tuple[int, ...]


class NDFLHeads(nn.Module):
    """Multi-level head + decode (ref dfl_heads.py:113-283)."""

    cfg: YoloNASConfig

    @nn.compact
    def __call__(self, feats, train: bool = False) -> YoloNASOutputs:
        c = self.cfg
        cls_list, reg_list, dist_list = [], [], []
        anchor_points, strides, num_anchors = [], [], []
        proj = jnp.arange(c.reg_max + 1, dtype=jnp.float32)

        for i, feat in enumerate(feats):
            b, hh, ww, _ = feat.shape
            reg_out, cls_out = YoloNASDFLHead(c, c.heads[i], name=f"head{i + 1}")(feat, train=train)
            a = hh * ww
            cls_list.append(cls_out.reshape(b, a, c.num_classes))
            reg_flat = reg_out.reshape(b, a, 4 * (c.reg_max + 1))
            reg_list.append(reg_flat)
            # DFL expectation: softmax over bins ⋅ arange — fused matmul on MXU
            prob = jax.nn.softmax(reg_flat.reshape(b, a, 4, c.reg_max + 1).astype(jnp.float32), axis=-1)
            dist_list.append(jnp.einsum("bank,k->ban", prob, proj))

            stride = float(c.heads[i].stride)
            sx = (jnp.arange(ww, dtype=jnp.float32) + c.grid_cell_offset)
            sy = (jnp.arange(hh, dtype=jnp.float32) + c.grid_cell_offset)
            gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
            anchor_points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
            strides.append(jnp.full((a, 1), stride, dtype=jnp.float32))
            num_anchors.append(a)

        cls_logits = jnp.concatenate(cls_list, axis=1)
        reg_distri = jnp.concatenate(reg_list, axis=1)
        distances = jnp.concatenate(dist_list, axis=1)
        points = jnp.concatenate(anchor_points, axis=0)
        stride_t = jnp.concatenate(strides, axis=0)

        pred_bboxes = batch_distance2bbox(points[None], distances) * stride_t[None, :, :]
        pred_scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
        return YoloNASOutputs(
            pred_bboxes=pred_bboxes,
            pred_scores=pred_scores,
            cls_logits=cls_logits,
            reg_distri=reg_distri,
            anchor_points=points,
            stride_tensor=stride_t,
            num_anchors_list=tuple(num_anchors),
        )


class YoloNAS(nn.Module):
    """backbone → neck → heads (ref customizable_detector.py:30-95)."""

    cfg: YoloNASConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> YoloNASOutputs:
        feats = NStageBackbone(self.cfg, name="backbone")(x, train=train)
        p3, p4, p5 = YoloNASPANNeckWithC2(self.cfg, name="neck")(feats, train=train)
        return NDFLHeads(self.cfg, name="heads")([p3, p4, p5], train=train)


def s2d_stem_params(params, input_scale: float = None):
    """Transform fused stem weights to the space-to-depth deploy form.

    The original stem is a fused 3x3 stride-2 conv ``W[3,3,C,O] + b`` with pad 1.
    Output(i,j) sums taps x[2i+di-1, 2j+dj-1], di,dj∈{0,1,2}. In s2d(2x2) block
    coordinates (block r holds rows 2r, 2r+1; channel index (p*2+q)*C+c) those taps
    live in blocks {i-1, i} × {j-1, j}, so the identical map is a 2x2 stride-1 conv
    with top/left pad 1 and kernel::

        W2[v, u, (p*2+q)*C + c, o] = W[2v+p-1, 2u+q-1, c, o]   (zero if index ∉ 0..2)

    ``input_scale`` additionally folds an input standardization ``x * input_scale``
    (e.g. 1/255) into the weights — the predict program can then consume raw uint8
    images with no separate elementwise pass over the full-res input.

    Returns a NEW params pytree with ``backbone/stem/conv/rbr_reparam`` replaced by
    ``backbone/stem/rbr_reparam_s2d``.
    """
    import numpy as np

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy via rebuild
    params = {**params}
    backbone = {**params["backbone"]}
    stem = backbone["stem"]
    if "conv" not in stem or "rbr_reparam" not in stem["conv"]:
        raise ValueError("s2d_stem_params requires a fully fused stem (fused='full')")
    w = np.asarray(stem["conv"]["rbr_reparam"]["kernel"], dtype=np.float32)  # [3,3,C,O]
    bias = np.asarray(stem["conv"]["rbr_reparam"]["bias"], dtype=np.float32)
    if input_scale is not None:
        w = w * float(input_scale)
    _, _, cin, cout = w.shape
    w2 = np.zeros((2, 2, 4 * cin, cout), dtype=np.float32)
    for v in range(2):
        for u in range(2):
            for p in range(2):
                for q in range(2):
                    di, dj = 2 * v + p - 1, 2 * u + q - 1
                    if 0 <= di <= 2 and 0 <= dj <= 2:
                        w2[v, u, (p * 2 + q) * cin : (p * 2 + q + 1) * cin, :] = w[di, dj]
    backbone["stem"] = {"rbr_reparam_s2d": {"kernel": jnp.asarray(w2), "bias": jnp.asarray(bias)}}
    params["backbone"] = backbone
    return params


# ------------------------------------------------------------------- variants
# Channel configs from recipes/arch_params/yolo_nas_{s,m,l}_arch_params.yaml.


def yolo_nas_s_config(num_classes: int = 80, fused: str = "none") -> YoloNASConfig:
    return YoloNASConfig(
        stem_channels=48,
        stages=(
            StageCfg(96, 2, 32, False),
            StageCfg(192, 3, 64, False),
            StageCfg(384, 5, 96, False),
            StageCfg(768, 2, 192, False),
        ),
        spp_channels=768,
        spp_k=(5, 9, 13),
        neck1=UpStageCfg(192, 2, 64, reduce_channels=True),
        neck2=UpStageCfg(96, 2, 48, reduce_channels=True),
        neck3=DownStageCfg(192, 2, 64),
        neck4=DownStageCfg(384, 2, 64),
        heads=(HeadCfg(128, 0.5, 8), HeadCfg(256, 0.5, 16), HeadCfg(512, 0.5, 32)),
        num_classes=num_classes,
        fused=fused,
    )


def yolo_nas_m_config(num_classes: int = 80, fused: str = "none") -> YoloNASConfig:
    return YoloNASConfig(
        stem_channels=48,
        stages=(
            StageCfg(96, 2, 64, True),
            StageCfg(192, 3, 128, True),
            StageCfg(384, 5, 256, True),
            StageCfg(768, 2, 384, False),
        ),
        spp_channels=768,
        spp_k=(5, 9, 13),
        neck1=UpStageCfg(192, 2, 192, reduce_channels=True),
        neck2=UpStageCfg(96, 3, 64, reduce_channels=True),
        neck3=DownStageCfg(192, 2, 192),
        neck4=DownStageCfg(384, 3, 256),
        heads=(HeadCfg(128, 0.75, 8), HeadCfg(256, 0.75, 16), HeadCfg(512, 0.75, 32)),
        num_classes=num_classes,
        fused=fused,
    )


def yolo_nas_l_config(num_classes: int = 80, fused: str = "none") -> YoloNASConfig:
    return YoloNASConfig(
        stem_channels=48,
        stages=(
            StageCfg(96, 2, 96, True),
            StageCfg(192, 3, 128, True),
            StageCfg(384, 5, 256, True),
            StageCfg(768, 2, 512, True),
        ),
        spp_channels=768,
        spp_k=(5, 9, 13),
        neck1=UpStageCfg(192, 4, 128, reduce_channels=True),
        neck2=UpStageCfg(96, 4, 128, reduce_channels=True),
        neck3=DownStageCfg(192, 4, 128),
        neck4=DownStageCfg(384, 4, 256),
        heads=(HeadCfg(128, 1.0, 8), HeadCfg(256, 1.0, 16), HeadCfg(512, 1.0, 32)),
        num_classes=num_classes,
        fused=fused,
    )
