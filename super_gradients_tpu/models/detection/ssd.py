"""SSD / SSD-lite MobileNet (flax, NHWC) — reference-faithful.

Reference: ``detection_models/ssd.py:20-57`` (CustomizableDetector assemblies from
``recipes/arch_params/ssd_{mobilenetv1,lite_mobilenetv2}_arch_params.yaml``),
``modules/detection_modules.py:197-410`` (MultiOutputBackbone / SSDBottleneckNeck /
SSDInvertedResidualNeck / SSDHead) and ``utils/ssd_utils.py:11-100`` (DefaultBoxes).

Faithfulness notes (all load-bearing for checkpoint conversion):

- default boxes are generated SIZE-MAJOR within a level (``for w,h in all_sizes:
  for i,j in product(grid)`` — ssd_utils.py:71-74) and clamped to the image;
- the head convs emit channels COORDINATE-major (``view(B, 4, -1)`` /
  ``view(B, C+1, -1)`` — detection_modules.py:385-386), i.e. channel
  ``c = coord * num_anchors + anchor``;
- SSDMobileNetV1 taps MobileNetV1 at ``layers.9`` only (stride 8) and prunes the
  rest of the trunk (MultiOutputModule(prune=True)); the neck is 5 bottleneck
  blocks (strides 2,2,2,1,1 / kernels 3,3,3,3,2, padding 1 only when stride 2);
- SSDLiteMobileNetV2 taps the EXPANDED (576ch) features inside block 14
  (``['features', 14, 'conv', 2]`` = post-ReLU6 of the pw-expand) plus the final
  1280ch ``features.18``; the neck is 4 stride-2 InvertedResiduals with
  fractional expand ratios; heads are SeperableConv2d (dw has bias AND BatchNorm)
  on all levels but the last.

Decoded outputs share the ``YoloNASOutputs`` contract (pred_bboxes xyxy px,
pred_scores = softmax class probs sans background) so NMS/metrics apply unchanged;
``cls_logits``/``reg_distri`` carry the raw (conf, loc) maps for SSDLoss.
"""

from __future__ import annotations

import dataclasses
import itertools
import math
from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.models.classification.mobilenet import InvertedResidual, MobileNetV2, _make_divisible
from super_gradients_tpu.models.detection.yolo_nas import YoloNASOutputs
from super_gradients_tpu.modules.blocks import ConvBNAct

# lite-MobileNetV2 assembly (ssd_lite_mobilenetv2_arch_params.yaml)
_LITE_V2_FEAT = (20, 10, 5, 3, 2, 1)
_LITE_V2_SCALES = (32, 82, 133, 184, 235, 285, 336)
_LITE_V2_ARS = ((2, 3),) * 6
# MobileNetV1 assembly (ssd_mobilenetv1_arch_params.yaml)
_V1_FEAT = (40, 20, 10, 5, 3, 2)
_V1_SCALES = (22, 48, 106, 163, 221, 278, 336)
_V1_ARS = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))


def generate_ssd_anchors(
    fig_size: int = 320,
    feat_sizes: Tuple[int, ...] = _LITE_V2_FEAT,
    scales: Tuple[int, ...] = _LITE_V2_SCALES,
    aspect_ratios: Tuple[Tuple[int, ...], ...] = _LITE_V2_ARS,
) -> np.ndarray:
    """Default boxes in cxcywh PIXEL units (ref ssd_utils.py:54-77 DefaultBoxes).

    Size-major within each level, clamped to [0, fig_size] (the reference clamps
    the normalized boxes to [0, 1])."""
    anchors = []
    for idx, (fs, ars) in enumerate(zip(feat_sizes, aspect_ratios)):
        sk1, sk2 = scales[idx], scales[idx + 1]
        sk3 = math.sqrt(sk1 * sk2)
        all_sizes = [(sk1, sk1), (sk3, sk3)]
        for ar in ars:
            w, h = sk1 * math.sqrt(ar), sk1 / math.sqrt(ar)
            all_sizes.append((w, h))
            all_sizes.append((h, w))
        for w, h in all_sizes:
            for i, j in itertools.product(range(fs), repeat=2):
                cx, cy = (j + 0.5) * fig_size / fs, (i + 0.5) * fig_size / fs
                anchors.append([cx, cy, w, h])
    return np.clip(np.asarray(anchors, np.float32), 0.0, fig_size)


def anchors_per_location(aspect_ratios) -> List[int]:
    return [2 + 2 * len(ars) for ars in aspect_ratios]


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    num_classes: int = 80  # without background
    fig_size: int = 320
    feat_sizes: Tuple[int, ...] = _LITE_V2_FEAT
    scales: Tuple[int, ...] = _LITE_V2_SCALES
    aspect_ratios: Tuple[Tuple[int, ...], ...] = _LITE_V2_ARS
    scale_xy: float = 0.1
    scale_wh: float = 0.2


def v1_config(num_classes: int = 80, fig_size: int = 320) -> SSDConfig:
    return SSDConfig(num_classes=num_classes, fig_size=fig_size,
                     feat_sizes=_V1_FEAT, scales=_V1_SCALES, aspect_ratios=_V1_ARS)


def _combine_and_decode(cfg: SSDConfig, locs, confs, na_list):
    """Mirror SSDHead.combine_preds + eval decode (detection_modules.py:380-410).

    Each head map is [B, H, W, ncols*na] with torch channel c = col*na + a; the
    reference flattens to [B, ncols, na*H*W] and concatenates levels on the
    anchor axis."""

    def _flat(o, ncols, na):
        b, h, w, _ = o.shape
        o = o.reshape(b, h, w, ncols, na)
        return o.transpose(0, 4, 1, 2, 3).reshape(b, na * h * w, ncols)

    loc = jnp.concatenate([_flat(o, 4, na) for o, na in zip(locs, na_list)], 1).astype(jnp.float32)
    conf = jnp.concatenate([_flat(o, cfg.num_classes + 1, na) for o, na in zip(confs, na_list)], 1).astype(jnp.float32)

    anchors = jnp.asarray(generate_ssd_anchors(cfg.fig_size, cfg.feat_sizes, cfg.scales, cfg.aspect_ratios))
    axy, awh = anchors[:, :2], anchors[:, 2:]

    # ref: bboxes_in *= [sxy,sxy,swh,swh]; xy = (b*dwh + dxy)*img; wh = exp(b)*dwh*img
    # (anchors here are already in pixels, so the *img factor is folded in)
    bb = loc * jnp.asarray([cfg.scale_xy, cfg.scale_xy, cfg.scale_wh, cfg.scale_wh])
    xy = bb[..., :2] * awh[None] + axy[None]
    wh = jnp.exp(jnp.clip(bb[..., 2:], -20.0, 20.0)) * awh[None]
    boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
    probs = jax.nn.softmax(conf, -1)[..., 1:]  # drop background (detection_modules.py:406-407)

    num_anchors = tuple(fs * fs * na for fs, na in zip(cfg.feat_sizes, na_list))
    return YoloNASOutputs(
        pred_bboxes=boxes,
        pred_scores=probs,
        cls_logits=conf,
        reg_distri=loc,
        anchor_points=axy,
        stride_tensor=jnp.ones((anchors.shape[0], 1), jnp.float32),
        num_anchors_list=num_anchors,
    )


class SSDMobileNetV1(nn.Module):
    """ref ssd.py:20-37 SSDMobileNetV1: MobileNetV1Backbone(out_layers=[['layers',9]])
    + SSDBottleneckNeck + non-lite SSDHead."""

    cfg: SSDConfig

    # MobileNetV1 cfg truncated at layers.9 (mobilenet.py:31, MultiOutputModule prunes)
    _TRUNK = (64, 128, (128, 2), 256, (256, 2), 512, 512, 512, 512, 512)
    _NECK = ((1024, 256, 3, 2), (512, 256, 3, 2), (256, 128, 3, 2), (256, 128, 3, 1), (256, 128, 2, 1))

    @nn.compact
    def __call__(self, x, train: bool = False) -> YoloNASOutputs:
        c = self.cfg
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)
        x = nn.relu(bn("bn1")(nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)))
        for i, blk in enumerate(self._TRUNK):
            out, s = (blk, 1) if isinstance(blk, int) else blk
            cin = x.shape[-1]
            # ref mobilenet.py:13-26 Block: dw conv1/bn1 + pw conv2/bn2
            x = nn.Conv(cin, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)), feature_group_count=cin,
                        use_bias=False, name=f"layers_{i}_conv1")(x)
            x = nn.relu(bn(f"layers_{i}_bn1")(x))
            x = nn.Conv(out, (1, 1), use_bias=False, name=f"layers_{i}_conv2")(x)
            x = nn.relu(bn(f"layers_{i}_bn2")(x))
        feats = [x]  # 512ch, stride 8

        y = x
        for i, (out, mid, k, s) in enumerate(self._NECK):
            pad = 1 if s == 2 else 0
            y = nn.relu(bn(f"neck_{i}_bn1")(nn.Conv(mid, (1, 1), use_bias=False, name=f"neck_{i}_conv1")(y)))
            y = nn.Conv(out, (k, k), strides=(s, s), padding=((pad, pad), (pad, pad)),
                        use_bias=False, name=f"neck_{i}_conv2")(y)
            y = nn.relu(bn(f"neck_{i}_bn2")(y))
            feats.append(y)

        na_list = anchors_per_location(c.aspect_ratios)
        locs, confs = [], []
        for i, (f, na) in enumerate(zip(feats, na_list)):
            locs.append(nn.Conv(na * 4, (3, 3), padding=((1, 1), (1, 1)), name=f"loc_{i}")(f))
            confs.append(nn.Conv(na * (c.num_classes + 1), (3, 3), padding=((1, 1), (1, 1)), name=f"conf_{i}")(f))
        return _combine_and_decode(c, locs, confs, na_list)


class SSDLiteMobileNetV2(nn.Module):
    """ref ssd.py:40-57 SSDLiteMobileNetV2: MobileNetV2Backbone tapped at
    ['features',14,'conv',2] (expanded 576ch) + ['features',18] (1280ch),
    SSDInvertedResidualNeck, lite SSDHead (SeperableConv2d)."""

    cfg: SSDConfig

    _NECK = ((512, 0.2), (256, 0.25), (256, 0.5), (64, 0.25))

    @nn.compact
    def __call__(self, x, train: bool = False) -> YoloNASOutputs:
        c = self.cfg
        x = ConvBNAct(out_channels=32, kernel=3, stride=2, act="relu6", name="stem")(x, train=train)
        feats = []
        i = 0
        for t, ch, n, s in MobileNetV2.CFG:
            cc = _make_divisible(ch)
            for j in range(n):
                if i == 13:  # torch features.14: tap the expanded features (conv.2)
                    x, expanded = InvertedResidual(cc, s if j == 0 else 1, t, tap_expand=True,
                                                   name=f"block_{i}")(x, train=train)
                    feats.append(expanded)  # 576ch, stride 16
                else:
                    x = InvertedResidual(cc, s if j == 0 else 1, t, name=f"block_{i}")(x, train=train)
                i += 1
        x = ConvBNAct(out_channels=1280, kernel=1, act="relu6", name="head_conv")(x, train=train)
        feats.append(x)  # 1280ch, stride 32

        for k, (out, ratio) in enumerate(self._NECK):
            x = InvertedResidual(out, 2, ratio, name=f"neck_{k}")(x, train=train)
            feats.append(x)

        na_list = anchors_per_location(c.aspect_ratios)
        locs, confs = [], []
        for i, (f, na) in enumerate(zip(feats, na_list)):
            cin = f.shape[-1]
            last = i == len(na_list) - 1
            for kind, ncols in (("loc", 4), ("conf", c.num_classes + 1)):
                if last:  # plain Conv2d on the final 1x1 map (detection_modules.py:358)
                    o = nn.Conv(na * ncols, (3, 3), padding=((1, 1), (1, 1)), name=f"{kind}_{i}")(f)
                else:  # SeperableConv2d (detection_modules.py:323-330): dw(+bias)+BN+ReLU+pw
                    o = nn.Conv(cin, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=cin,
                                use_bias=True, name=f"{kind}_{i}_dw")(f)
                    o = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"{kind}_{i}_dwbn")(o)
                    o = nn.Conv(na * ncols, (1, 1), name=f"{kind}_{i}_pw")(nn.relu(o))
                (locs if kind == "loc" else confs).append(o)
        return _combine_and_decode(c, locs, confs, na_list)
