"""DEKR HRNet-W32 bottom-up pose estimation (flax, NHWC).

Reference: ``pose_estimation_models/dekr_hrnet.py`` (732 LoC) — HRNet-W32 backbone
(multi-resolution branches with fuse layers), DEKR heads: a heatmap branch
(1 center + K keypoint heatmaps) and per-keypoint offset branches built on
**deformable** adaptive convolutions (torchvision DeformConv2d at :138 — here the
pure-XLA ``ops.deform_conv.deform_conv2d``).

Decode (ref DEKRPoseEstimationDecodeCallback): center heatmap peaks → per-center
keypoint offsets → poses; implemented as fixed-k top-k (static shapes).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.classification.resnet import BottleneckBlock
from super_gradients_tpu.modules.blocks import ConvBNAct
from super_gradients_tpu.ops.deform_conv import deform_conv2d


class HRBasicBlock(nn.Module):
    planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBNAct(out_channels=self.planes, kernel=3, act="relu", name="conv1")(x, train=train)
        y = ConvBNAct(out_channels=self.planes, kernel=3, act="identity", name="conv2")(y, train=train)
        if x.shape[-1] != self.planes:
            x = ConvBNAct(out_channels=self.planes, kernel=1, act="identity", name="shortcut")(x, train=train)
        return nn.relu(x + y)


class HRFuse(nn.Module):
    """Multi-resolution fuse: every branch receives every other branch resampled."""

    widths: Tuple[int, ...]

    @nn.compact
    def __call__(self, feats, train: bool = False):
        out = []
        for i, wi in enumerate(self.widths):
            acc = None
            for j, fj in enumerate(feats):
                if j == i:
                    y = fj
                elif j < i:  # downsample j -> i with strided convs
                    y = fj
                    for s in range(i - j):
                        last = s == i - j - 1
                        y = ConvBNAct(
                            out_channels=wi if last else self.widths[j], kernel=3, stride=2,
                            act="identity" if last else "relu", name=f"down{j}to{i}_{s}",
                        )(y, train=train)
                else:  # upsample j -> i
                    y = ConvBNAct(out_channels=wi, kernel=1, act="identity", name=f"up{j}to{i}")(fj, train=train)
                    b, h, w, c = y.shape
                    scale = 2 ** (j - i)
                    y = jax.image.resize(y, (b, h * scale, w * scale, c), "nearest")
                acc = y if acc is None else acc + y
            out.append(nn.relu(acc))
        return out


class HRModule(nn.Module):
    widths: Tuple[int, ...]
    blocks_per_branch: int = 4

    @nn.compact
    def __call__(self, feats, train: bool = False):
        feats = list(feats)
        for bi, w in enumerate(self.widths):
            y = feats[bi]
            for k in range(self.blocks_per_branch):
                y = HRBasicBlock(w, name=f"branch{bi}_block{k}")(y, train=train)
            feats[bi] = y
        return HRFuse(self.widths, name="fuse")(feats, train=train)


@dataclasses.dataclass(frozen=True)
class DEKRConfig:
    num_joints: int = 17
    width: int = 32  # HRNet-W32
    stage_modules: Tuple[int, ...] = (1, 4, 3)  # modules in stages 2/3/4
    offset_channels_per_joint: int = 15


class DEKROutputs(NamedTuple):
    heatmaps: jnp.ndarray  # [B, H/4, W/4, 1 + K] (center + per-joint)
    offsets: jnp.ndarray  # [B, H/4, W/4, 2K]


class DEKRPoseEstimationModel(nn.Module):
    """ref dekr_hrnet.py DEKRPoseEstimationModel."""

    cfg: DEKRConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> DEKROutputs:
        c = self.cfg
        w = c.width
        # stem: two stride-2 convs then 4 bottlenecks (stage1)
        x = ConvBNAct(out_channels=64, kernel=3, stride=2, act="relu", name="stem1")(x, train=train)
        x = ConvBNAct(out_channels=64, kernel=3, stride=2, act="relu", name="stem2")(x, train=train)
        for i in range(4):
            x = BottleneckBlock(64, expansion=4, name=f"layer1_{i}")(x, train=train)

        widths2 = (w, w * 2)
        widths3 = (w, w * 2, w * 4)
        widths4 = (w, w * 2, w * 4, w * 8)

        # transition1
        f0 = ConvBNAct(out_channels=w, kernel=3, act="relu", name="trans1_0")(x, train=train)
        f1 = ConvBNAct(out_channels=w * 2, kernel=3, stride=2, act="relu", name="trans1_1")(x, train=train)
        feats = [f0, f1]
        for m in range(c.stage_modules[0]):
            feats = HRModule(widths2, name=f"stage2_m{m}")(feats, train=train)
        # transition2: new branch from last
        feats.append(ConvBNAct(out_channels=w * 4, kernel=3, stride=2, act="relu", name="trans2")(feats[-1], train=train))
        for m in range(c.stage_modules[1]):
            feats = HRModule(widths3, name=f"stage3_m{m}")(feats, train=train)
        feats.append(ConvBNAct(out_channels=w * 8, kernel=3, stride=2, act="relu", name="trans3")(feats[-1], train=train))
        for m in range(c.stage_modules[2]):
            feats = HRModule(widths4, name=f"stage4_m{m}")(feats, train=train)

        # concat all branches at 1/4 resolution
        b, h4, w4, _ = feats[0].shape
        ups = [feats[0]]
        for j in range(1, 4):
            y = feats[j]
            scale = 2 ** j
            ups.append(jax.image.resize(y, (b, h4, w4, y.shape[-1]), "bilinear"))
        cat = jnp.concatenate(ups, axis=-1)  # [B, H/4, W/4, 15w]

        # heatmap branch: 1 center + K joints
        hm = ConvBNAct(out_channels=w, kernel=1, act="relu", name="heatmap_conv")(cat, train=train)
        hm = HRBasicBlock(w, name="heatmap_block")(hm, train=train)
        heatmaps = nn.Conv(1 + c.num_joints, (1, 1), name="heatmap_pred")(hm)

        # offset branch: per-joint adaptive (deformable) regression
        k = c.num_joints
        oc = c.offset_channels_per_joint
        off_feat = ConvBNAct(out_channels=k * oc, kernel=1, act="relu", name="offset_conv")(cat, train=train)
        per_joint = jnp.split(off_feat, k, axis=-1)
        offsets = []
        for j, fj in enumerate(per_joint):
            # adaptive block: predict offsets for a deformable 3x3, then regress (dy, dx)
            off_field = nn.Conv(18, (3, 3), padding=((1, 1), (1, 1)), kernel_init=nn.initializers.zeros, name=f"adapt_off_{j}")(fj)
            kernel = self.param(f"adapt_kernel_{j}", nn.initializers.lecun_normal(), (3, 3, oc, oc))
            fj = deform_conv2d(fj.astype(jnp.float32), off_field.astype(jnp.float32), kernel)
            fj = nn.relu(nn.BatchNorm(use_running_average=not train, name=f"adapt_bn_{j}")(fj))
            offsets.append(nn.Conv(2, (1, 1), name=f"offset_pred_{j}")(fj))
        offsets = jnp.concatenate(offsets, axis=-1)  # [B, H/4, W/4, 2K]
        return DEKROutputs(heatmaps=heatmaps, offsets=offsets)


def dekr_decode(outputs: DEKROutputs, max_people: int = 30, center_threshold: float = 0.1):
    """Decode DEKR outputs into poses (ref DEKRPoseEstimationDecodeCallback).

    Returns (poses [B, max_people, K, 3], scores [B, max_people]).
    """
    hm = jax.nn.sigmoid(outputs.heatmaps.astype(jnp.float32))
    center = hm[..., 0]  # [B, H, W]
    b, h, w = center.shape
    k = outputs.offsets.shape[-1] // 2

    flat = center.reshape(b, -1)
    scores, idx = jax.lax.top_k(flat, max_people)
    cy = (idx // w).astype(jnp.float32)
    cx = (idx % w).astype(jnp.float32)

    offs = outputs.offsets.reshape(b, h * w, k, 2)
    sel = jnp.take_along_axis(offs, idx[:, :, None, None], axis=1)  # [B, P, K, 2]
    # DEKR offsets are (dx, dy) from the center, at 1/4 resolution; scale to input px
    px = (cx[:, :, None] + sel[..., 0]) * 4.0
    py = (cy[:, :, None] + sel[..., 1]) * 4.0

    joint_hm = hm[..., 1:].reshape(b, h * w, k)
    # keypoint confidence: joint heatmap at the rounded keypoint location
    jx = jnp.clip(jnp.round(px / 4.0), 0, w - 1).astype(jnp.int32)
    jy = jnp.clip(jnp.round(py / 4.0), 0, h - 1).astype(jnp.int32)
    jidx = jy * w + jx  # [B, P, K]
    conf = jnp.take_along_axis(joint_hm.transpose(0, 2, 1).reshape(b, k, h * w), jidx.transpose(0, 2, 1), axis=2)
    conf = conf.transpose(0, 2, 1)  # [B, P, K]

    poses = jnp.stack([px, py, conf], axis=-1)
    valid = scores > center_threshold
    poses = poses * valid[:, :, None, None]
    scores = scores * valid
    return poses, scores
