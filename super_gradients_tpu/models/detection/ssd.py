"""SSD / SSD-lite MobileNet (flax, NHWC).

Reference: ``detection_models/ssd.py`` (SSDLiteMobileNetV2, SSDMobileNetV1) +
``utils/ssd_utils.py`` (DefaultBoxes anchors, SSDPostPredictCallback). Anchors are
the standard SSD default boxes; the head emits per-anchor (loc[4], conf[C+1]).
Decoded boxes share the ``YoloNASOutputs`` contract (scores drop the background
column) so NMS/metrics apply unchanged.
"""

from __future__ import annotations

import dataclasses
import itertools
import math
from typing import List, NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.models.classification.mobilenet import InvertedResidual
from super_gradients_tpu.models.detection.yolo_nas import YoloNASOutputs
from super_gradients_tpu.modules.blocks import ConvBNAct


def generate_ssd_anchors(
    fig_size: int = 320,
    feat_sizes: Tuple[int, ...] = (20, 10, 5, 3, 2, 1),
    scales: Tuple[int, ...] = (22, 48, 106, 163, 221, 278, 336),
    aspect_ratios: Tuple[Tuple[int, ...], ...] = ((2,), (2, 3), (2, 3), (2, 3), (2, 3), (2, 3)),
) -> np.ndarray:
    """Default boxes in cxcywh, pixel units (ref ssd_utils.py DefaultBoxes)."""
    anchors = []
    for idx, (fs, ars) in enumerate(zip(feat_sizes, aspect_ratios)):
        sk1 = scales[idx]
        sk2 = scales[idx + 1]
        sk3 = math.sqrt(sk1 * sk2)
        sizes = [(sk1, sk1), (sk3, sk3)]
        for ar in ars:
            w, h = sk1 * math.sqrt(ar), sk1 / math.sqrt(ar)
            sizes.append((w, h))
            sizes.append((h, w))
        for i, j in itertools.product(range(fs), repeat=2):
            cx, cy = (j + 0.5) * fig_size / fs, (i + 0.5) * fig_size / fs
            for w, h in sizes:
                anchors.append([cx, cy, w, h])
    return np.asarray(anchors, np.float32)


def anchors_per_location(aspect_ratios) -> List[int]:
    return [2 + 2 * len(ars) for ars in aspect_ratios]


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    num_classes: int = 80  # without background
    fig_size: int = 320
    feat_sizes: Tuple[int, ...] = (20, 10, 5, 3, 2, 1)
    scales: Tuple[int, ...] = (22, 48, 106, 163, 221, 278, 336)
    aspect_ratios: Tuple[Tuple[int, ...], ...] = ((2,), (2, 3), (2, 3), (2, 3), (2, 3), (2, 3))
    scale_xy: float = 0.1
    scale_wh: float = 0.2


class SSDLiteMobileNetV2(nn.Module):
    """ref ssd.py SSDLiteMobileNetV2 (MobileNetV2 trunk + SSD-lite extras/heads);
    ``backbone="mobilenet_v1"`` gives the reference's SSDMobileNetV1 variant."""

    cfg: SSDConfig
    backbone: str = "mobilenet_v2"

    @nn.compact
    def __call__(self, x, train: bool = False) -> YoloNASOutputs:
        c = self.cfg
        # MobileNet trunk, tapped at stride 16 + stride 32 (standard SSD taps)
        from super_gradients_tpu.models.classification.mobilenet import MobileNetV1, MobileNetV2, _make_divisible

        feats = []
        if self.backbone == "mobilenet_v1":
            x_ = ConvBNAct(out_channels=32, kernel=3, stride=2, act="relu", name="stem")(x, train=train)
            for i, blk in enumerate(MobileNetV1.CFG):
                out, s = (blk, 1) if isinstance(blk, int) else blk
                cin = x_.shape[-1]
                if s == 2 and out == 1024:
                    feats.append(x_)  # stride 16 tap before the final downsample
                x_ = ConvBNAct(out_channels=cin, kernel=3, stride=s, groups=cin, act="relu", name=f"dw_{i}")(x_, train=train)
                x_ = ConvBNAct(out_channels=out, kernel=1, act="relu", name=f"pw_{i}")(x_, train=train)
            feats.append(x_)  # stride 32
        else:
            x_ = ConvBNAct(out_channels=32, kernel=3, stride=2, act="relu6", name="stem")(x, train=train)
            i = 0
            tap_block = 12  # before stride-32 downsample
            for t, ch, n, s in MobileNetV2.CFG:
                for j in range(n):
                    x_ = InvertedResidual(_make_divisible(ch), s if j == 0 else 1, t, name=f"block_{i}")(x_, train=train)
                    if i == tap_block:
                        feats.append(x_)  # stride 16
                    i += 1
            x_ = ConvBNAct(out_channels=1280, kernel=1, act="relu6", name="head_conv")(x_, train=train)
            feats.append(x_)  # stride 32

        # SSD extras: 4 more downsampling blocks
        chans = [512, 256, 256, 64]
        for k, ch in enumerate(chans):
            y = ConvBNAct(out_channels=ch // 2, kernel=1, act="relu6", name=f"extra{k}_pw")(x_, train=train)
            y = ConvBNAct(out_channels=ch // 2, kernel=3, stride=2, groups=ch // 2, act="relu6", name=f"extra{k}_dw")(y, train=train)
            x_ = ConvBNAct(out_channels=ch, kernel=1, act="relu6", name=f"extra{k}_out")(y, train=train)
            feats.append(x_)

        napl = anchors_per_location(c.aspect_ratios)
        locs, confs = [], []
        for k, (f, na) in enumerate(zip(feats, napl)):
            cin = f.shape[-1]
            lf = ConvBNAct(out_channels=cin, kernel=3, groups=cin, act="relu6", name=f"loc{k}_dw")(f, train=train)
            loc = nn.Conv(na * 4, (1, 1), name=f"loc{k}_pred")(lf)
            cf = ConvBNAct(out_channels=cin, kernel=3, groups=cin, act="relu6", name=f"conf{k}_dw")(f, train=train)
            conf = nn.Conv(na * (c.num_classes + 1), (1, 1), name=f"conf{k}_pred")(cf)
            b = f.shape[0]
            locs.append(loc.reshape(b, -1, 4))
            confs.append(conf.reshape(b, -1, c.num_classes + 1))
        loc = jnp.concatenate(locs, 1).astype(jnp.float32)  # [B, A, 4]
        conf = jnp.concatenate(confs, 1).astype(jnp.float32)  # [B, A, C+1]

        anchors_cxcywh = jnp.asarray(
            generate_ssd_anchors(c.fig_size, c.feat_sizes, c.scales, c.aspect_ratios)
        )  # [A, 4]

        # decode (ref ssd_utils: scale_xy/scale_wh encoding)
        acx, acy, aw, ah = [anchors_cxcywh[:, i] for i in range(4)]
        cx = loc[..., 0] * c.scale_xy * aw[None] + acx[None]
        cy = loc[..., 1] * c.scale_xy * ah[None] + acy[None]
        w = jnp.exp(jnp.clip(loc[..., 2] * c.scale_wh, -10, 8)) * aw[None]
        h = jnp.exp(jnp.clip(loc[..., 3] * c.scale_wh, -10, 8)) * ah[None]
        boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
        probs = jax.nn.softmax(conf, -1)[..., 1:]  # drop background

        num_anchors = tuple(fs * fs * na for fs, na in zip(c.feat_sizes, napl))
        points = anchors_cxcywh[:, :2]
        return YoloNASOutputs(
            pred_bboxes=boxes,
            pred_scores=probs,
            cls_logits=conf,
            reg_distri=loc,
            anchor_points=points,
            stride_tensor=jnp.ones((points.shape[0], 1), jnp.float32),
            num_anchors_list=num_anchors,
        )
