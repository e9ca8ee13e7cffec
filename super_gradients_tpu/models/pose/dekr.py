"""DEKR HRNet-W32 bottom-up pose estimation (flax, NHWC).

Reference: ``pose_estimation_models/dekr_hrnet.py`` (732 LoC) — HRNet-W32 backbone
(stem → Bottleneck layer1 → 3 transition/stage pairs of HighResolutionModules
with fuse layers) and DEKR heads: a heatmap branch (K joints + trailing center
channel) and per-keypoint offset regression branches. This build mirrors the
shipped ``dekr_w32_no_dc`` variant (pose_dekr_w32_no_dc_arch_params.yaml): BASIC
offset blocks with dilation 5 replacing the deformable ADAPTIVE conv, which is
also the exportable configuration. ``offset_block="adaptive"`` switches to the
deformable path (ops.deform_conv) for the original DC architecture.

Module naming mirrors the reference's attribute tree so checkpoints convert via
``conversion/torch_converter.DEKR_RULES``.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.classification.resnet import BottleneckBlock
from super_gradients_tpu.ops.deform_conv import deform_conv2d


class DEKRBasicBlock(nn.Module):
    """ref dekr_hrnet.py:45-78 BasicBlock: two dilated 3x3 convs, residual, relu.
    (Note the reference quirk: conv2 also uses `stride`; in every instantiation
    stride==1 and inplanes==planes so the blocks are plain residual blocks.)"""

    planes: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        conv = lambda name: nn.Conv(self.planes, (3, 3), padding=((d, d), (d, d)),
                                    kernel_dilation=(d, d), use_bias=False, name=name)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)
        y = nn.relu(bn("bn1")(conv("conv1")(x)))
        y = bn("bn2")(conv("conv2")(y))
        return nn.relu(y + x)


def _conv_bn_relu(x, out_ch: int, name: str, train: bool, stride: int = 1, kernel: int = 3):
    p = kernel // 2
    x = nn.Conv(out_ch, (kernel, kernel), strides=(stride, stride),
                padding=((p, p), (p, p)), use_bias=False, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"{name}_bn")(x)
    return nn.relu(x)


# dekr_w32_no_dc spec (pose_dekr_w32_no_dc_arch_params.yaml SPEC.STAGES)
_NUM_MODULES = (1, 4, 3)
_NUM_BRANCHES = (2, 3, 4)
_NUM_BLOCKS = 4


@dataclasses.dataclass(frozen=True)
class DEKRConfig:
    num_joints: int = 17
    width: int = 32  # HRNet-W32
    stage_modules: Tuple[int, ...] = _NUM_MODULES
    offset_channels_per_joint: int = 15
    heatmap_channels: int = 32
    heatmap_blocks: int = 1
    offset_blocks: int = 2
    offset_dilation: int = 5
    offset_block: str = "basic"  # basic (no_dc, exportable) | adaptive (deformable)


class DEKROutputs(NamedTuple):
    heatmaps: jnp.ndarray  # [B, H/4, W/4, K + 1] — joints, then the CENTER channel
    offsets: jnp.ndarray  # [B, H/4, W/4, 2K]


class DEKRPoseEstimationModel(nn.Module):
    """ref dekr_hrnet.py:298-533 DEKRPoseEstimationModel (no-DC spec)."""

    cfg: DEKRConfig

    def _hr_module(self, s: int, m: int, feats: List[jnp.ndarray], ch: Sequence[int], train: bool):
        """One HighResolutionModule (ref :171-290): per-branch block stacks, then
        the full fuse grid (1x1+up for j>i, strided 3x3 chains for j<i)."""
        nb = len(ch)
        feats = list(feats)
        for b in range(nb):
            y = feats[b]
            for k in range(_NUM_BLOCKS):
                y = DEKRBasicBlock(ch[b], name=f"stage{s}_m{m}_branch{b}_blk{k}")(y, train=train)
            feats[b] = y

        def fuse(i, j, y):
            if j > i:  # 1x1 conv + BN + nearest upsample 2^(j-i)
                y = nn.Conv(ch[i], (1, 1), use_bias=False, name=f"stage{s}_m{m}_fuse{i}_{j}")(y)
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name=f"stage{s}_m{m}_fuse{i}_{j}_bn")(y)
                b_, h_, w_, c_ = y.shape
                scale = 2 ** (j - i)
                return jax.image.resize(y, (b_, h_ * scale, w_ * scale, c_), "nearest")
            # j < i: chain of strided 3x3 conv+BN (+relu except last)
            for k in range(i - j):
                last = k == i - j - 1
                out_ch = ch[i] if last else ch[j]
                y = nn.Conv(out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            use_bias=False, name=f"stage{s}_m{m}_fuse{i}_{j}_{k}")(y)
                y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"stage{s}_m{m}_fuse{i}_{j}_{k}_bn")(y)
                if not last:
                    y = nn.relu(y)
            return y

        out = []
        for i in range(nb):
            acc = feats[0] if i == 0 else fuse(i, 0, feats[0])
            for j in range(1, nb):
                acc = acc + (feats[j] if i == j else fuse(i, j, feats[j]))
            out.append(nn.relu(acc))
        return out

    @nn.compact
    def __call__(self, x, train: bool = False) -> DEKROutputs:
        c = self.cfg
        w = c.width
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)
        # stem (ref :312-317): two stride-2 3x3 convs
        x = nn.relu(bn("bn1")(nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(64, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(x)))
        for i in range(4):
            x = BottleneckBlock(64, expansion=4, name=f"layer1_{i}")(x, train=train)

        stage_channels = [tuple(w * 2**b for b in range(nb)) for nb in _NUM_BRANCHES]

        y_list = [x]
        prev_ch = [256]
        for si, ch in enumerate(stage_channels):
            s = si + 2  # reference numbering: stage2..stage4 / transition1..3
            x_list = []
            for j in range(len(ch)):
                if j < len(prev_ch) and ch[j] == prev_ch[j]:
                    x_list.append(y_list[j])
                elif j < len(prev_ch):
                    x_list.append(_conv_bn_relu(y_list[-1], ch[j], f"transition{si + 1}_{j}", train))
                else:  # new (lowest-resolution) branch from the previous last branch
                    t = y_list[-1]
                    for q in range(j + 1 - len(prev_ch)):
                        out_ch = ch[j] if q == j - len(prev_ch) else prev_ch[-1]
                        t = _conv_bn_relu(t, out_ch, f"transition{si + 1}_{j}_{q}", train, stride=2)
                    x_list.append(t)
            for m in range(c.stage_modules[si]):
                x_list = self._hr_module(s, m, x_list, ch, train)
            y_list = x_list
            prev_ch = list(ch)

        # concat all branches at 1/4 resolution (ref :508-518, bilinear upsample)
        b, h4, w4, _ = y_list[0].shape
        ups = [y_list[0]]
        for j in range(1, len(y_list)):
            y = y_list[j]
            ups.append(jax.image.resize(y, (b, h4, w4, y.shape[-1]), "bilinear"))
        cat = jnp.concatenate(ups, axis=-1)  # [B, H/4, W/4, 15w]

        # heatmap head: transition (1x1 conv+bn+relu) → BASIC block(s) → 1x1 pred
        hm = _conv_bn_relu(cat, c.heatmap_channels, "transition_heatmap", train, kernel=1)
        for k in range(c.heatmap_blocks):
            hm = DEKRBasicBlock(c.heatmap_channels, name=f"head_heatmap_blk{k}")(hm, train=train)
        heatmaps = nn.Conv(c.num_joints + 1, (1, 1), name="heatmap_pred")(hm)

        # offset head: transition → per-joint block stacks → per-joint (dx, dy)
        k_j = c.num_joints
        oc = c.offset_channels_per_joint
        off = _conv_bn_relu(cat, k_j * oc, "transition_offset", train, kernel=1)
        per_joint = jnp.split(off, k_j, axis=-1)
        offsets = []
        for j, fj in enumerate(per_joint):
            if c.offset_block == "adaptive":
                # deformable ADAPTIVE path (ref AdaptBlock :123-168, DC variant)
                off_field = nn.Conv(18, (3, 3), padding=((1, 1), (1, 1)),
                                    kernel_init=nn.initializers.zeros, name=f"adapt_off_{j}")(fj)
                kern = self.param(f"adapt_kernel_{j}", nn.initializers.lecun_normal(), (3, 3, oc, oc))
                fj = deform_conv2d(fj.astype(jnp.float32), off_field.astype(jnp.float32), kern)
                fj = nn.relu(nn.BatchNorm(use_running_average=not train, name=f"adapt_bn_{j}")(fj))
            else:
                for k in range(c.offset_blocks):
                    fj = DEKRBasicBlock(oc, dilation=c.offset_dilation,
                                        name=f"offset_feat{j}_blk{k}")(fj, train=train)
            offsets.append(nn.Conv(2, (1, 1), name=f"offset_pred{j}")(fj))
        offsets = jnp.concatenate(offsets, axis=-1)  # [B, H/4, W/4, 2K]
        return DEKROutputs(heatmaps=heatmaps, offsets=offsets)


def dekr_decode(outputs: DEKROutputs, max_people: int = 30, center_threshold: float = 0.1):
    """Decode DEKR outputs into poses (ref DEKRPoseEstimationDecodeCallback).

    Returns (poses [B, max_people, K, 3], scores [B, max_people]).
    """
    hm = jax.nn.sigmoid(outputs.heatmaps.astype(jnp.float32))
    # channel layout matches the reference/targets: joints first, CENTER last
    center = hm[..., -1]  # [B, H, W]
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

    joint_hm = hm[..., :-1].reshape(b, h * w, k)
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
