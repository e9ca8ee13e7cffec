"""YOLO-NAS-POSE N/S/M/L (flax, NHWC).

Reference: ``models/pose_estimation_models/yolo_nas_pose/`` —
``yolo_nas_pose_dfl_head.py`` (per-level head: shared bbox branch + pose regression
branch, pose conf in the class head), ``yolo_nas_pose_ndfl_heads.py`` (decode:
keypoints = (offsets + anchor - grid_cell_offset) * stride),
``yolo_nas_pose_variants.py`` + ``recipes/arch_params/yolo_nas_pose_*.yaml``.

Backbone + PAN neck are the detection YoloNAS modules (S/M/L identical configs;
N uses its own slimmer channel set per yolo_nas_pose_n_arch_params.yaml).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.detection.yolo_nas import (
    DownStageCfg,
    NStageBackbone,
    StageCfg,
    UpStageCfg,
    YoloNASConfig,
    YoloNASPANNeckWithC2,
    yolo_nas_l_config,
    yolo_nas_m_config,
    yolo_nas_s_config,
)
from super_gradients_tpu.modules.blocks import ConvBNAct, width_multiplier
from super_gradients_tpu.ops.bbox import batch_distance2bbox


@dataclasses.dataclass(frozen=True)
class PoseHeadCfg:
    bbox_inter_channels: int
    pose_inter_channels: int
    pose_regression_blocks: int
    width_mult: float
    stride: int


@dataclasses.dataclass(frozen=True)
class YoloNASPoseConfig:
    base: YoloNASConfig  # backbone/neck channels (num_classes unused)
    heads: Tuple[PoseHeadCfg, ...]
    num_joints: int = 17
    reg_max: int = 16
    pose_offset_multiplier: float = 1.0
    compensate_grid_cell_offset: bool = True
    grid_cell_offset: float = 0.5
    bn_eps: float = 1e-3
    bn_momentum: float = 0.03


class YoloNASPoseDFLHead(nn.Module):
    """Per-level pose head (ref yolo_nas_pose_dfl_head.py, shared_stem=False,
    pose_conf_in_class_head=True, pose_block_use_repvgg=False)."""

    cfg: YoloNASPoseConfig
    head: PoseHeadCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c, h = self.cfg, self.head
        bi = width_multiplier(h.bbox_inter_channels, h.width_mult, 8)
        pi = width_multiplier(h.pose_inter_channels, h.width_mult, 8)
        conv = partial(ConvBNAct, act="relu", bn_eps=c.bn_eps, bn_momentum=c.bn_momentum)

        pose_feat = conv(out_channels=pi, kernel=1, name="pose_stem")(x, train=train)
        bbox_feat = conv(out_channels=bi, kernel=1, name="bbox_stem")(x, train=train)

        cls_feat = conv(out_channels=bi, kernel=3, name="cls_convs")(bbox_feat, train=train)
        prior_bias = -math.log((1 - 0.01) / 0.01)
        cls_out = nn.Conv(
            1 + c.num_joints, (1, 1), use_bias=True, bias_init=nn.initializers.constant(prior_bias), name="cls_pred"
        )(cls_feat)

        reg_feat = conv(out_channels=bi, kernel=3, name="reg_convs")(bbox_feat, train=train)
        reg_out = nn.Conv(4 * (c.reg_max + 1), (1, 1), use_bias=True, name="reg_pred")(reg_feat)

        pf = pose_feat
        for i in range(h.pose_regression_blocks):
            pf = conv(out_channels=pi, kernel=3, name=f"pose_convs_{i}")(pf, train=train)
        pose_out = nn.Conv(2 * c.num_joints, (1, 1), use_bias=True, name="pose_pred")(pf)

        # pose conf lives in the class head (channels 1..J); channel 0 is objectness
        cls_logit = cls_out[..., 0:1]
        pose_logits = cls_out[..., 1:]
        b, hh, ww, _ = pose_out.shape
        pose_reg = pose_out.reshape(b, hh, ww, c.num_joints, 2)
        return reg_out, cls_logit, pose_reg, pose_logits


class YoloNASPoseOutputs(NamedTuple):
    pred_bboxes: jnp.ndarray  # [B, A, 4] xyxy px
    pred_scores: jnp.ndarray  # [B, A, 1]
    pred_pose_coords: jnp.ndarray  # [B, A, J, 2] px
    pred_pose_scores: jnp.ndarray  # [B, A, J]
    cls_logits: jnp.ndarray  # [B, A, 1]
    reg_distri: jnp.ndarray  # [B, A, 4*(reg_max+1)]
    pose_logits: jnp.ndarray  # [B, A, J]
    anchor_points: jnp.ndarray  # [A, 2] stride units (+offset)
    stride_tensor: jnp.ndarray  # [A, 1]
    num_anchors_list: Tuple[int, ...]


class YoloNASPose(nn.Module):
    """Full pose model (ref yolo_nas_pose_variants.py:1-406)."""

    cfg: YoloNASPoseConfig

    @nn.compact
    def __call__(self, x, train: bool = False) -> YoloNASPoseOutputs:
        c = self.cfg
        feats = NStageBackbone(c.base, name="backbone")(x, train=train)
        p3, p4, p5 = YoloNASPANNeckWithC2(c.base, name="neck")(feats, train=train)

        cls_list, reg_list, dist_list, pose_reg_list, pose_logit_list = [], [], [], [], []
        anchor_points, strides, num_anchors = [], [], []
        proj = jnp.arange(c.reg_max + 1, dtype=jnp.float32)

        for i, feat in enumerate([p3, p4, p5]):
            b, hh, ww, _ = feat.shape
            reg_out, cls_logit, pose_reg, pose_logits = YoloNASPoseDFLHead(c, c.heads[i], name=f"head{i + 1}")(
                feat, train=train
            )
            a = hh * ww
            cls_list.append(cls_logit.reshape(b, a, 1))
            reg_flat = reg_out.reshape(b, a, 4 * (c.reg_max + 1))
            reg_list.append(reg_flat)
            prob = jax.nn.softmax(reg_flat.reshape(b, a, 4, c.reg_max + 1).astype(jnp.float32), axis=-1)
            dist_list.append(jnp.einsum("bank,k->ban", prob, proj))
            pose_reg_list.append(pose_reg.reshape(b, a, c.num_joints, 2))
            pose_logit_list.append(pose_logits.reshape(b, a, c.num_joints))

            stride = float(c.heads[i].stride)
            sx = jnp.arange(ww, dtype=jnp.float32) + c.grid_cell_offset
            sy = jnp.arange(hh, dtype=jnp.float32) + c.grid_cell_offset
            gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
            anchor_points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
            strides.append(jnp.full((a, 1), stride, dtype=jnp.float32))
            num_anchors.append(a)

        cls_logits = jnp.concatenate(cls_list, axis=1)
        reg_distri = jnp.concatenate(reg_list, axis=1)
        distances = jnp.concatenate(dist_list, axis=1)
        pose_reg = jnp.concatenate(pose_reg_list, axis=1).astype(jnp.float32)
        pose_logits = jnp.concatenate(pose_logit_list, axis=1)
        points = jnp.concatenate(anchor_points, axis=0)
        stride_t = jnp.concatenate(strides, axis=0)

        pred_bboxes = batch_distance2bbox(points[None], distances) * stride_t[None]
        pred_scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))

        # keypoint decode (ref ndfl_heads.py:184-196)
        pr = pose_reg * c.pose_offset_multiplier
        offset = c.grid_cell_offset if c.compensate_grid_cell_offset else 0.0
        coords = (pr + points[None, :, None, :] - offset) * stride_t[None, :, None, :]
        pose_scores = jax.nn.sigmoid(pose_logits.astype(jnp.float32))

        return YoloNASPoseOutputs(
            pred_bboxes=pred_bboxes,
            pred_scores=pred_scores,
            pred_pose_coords=coords,
            pred_pose_scores=pose_scores,
            cls_logits=cls_logits,
            reg_distri=reg_distri,
            pose_logits=pose_logits,
            anchor_points=points,
            stride_tensor=stride_t,
            num_anchors_list=tuple(num_anchors),
        )


# ------------------------------------------------------------------- variants


def _pose_heads(width_mult: float, blocks=(2, 2, 3)) -> Tuple[PoseHeadCfg, ...]:
    return (
        PoseHeadCfg(128, 128, blocks[0], width_mult, 8),
        PoseHeadCfg(256, 512, blocks[1], width_mult, 16),
        PoseHeadCfg(512, 512, blocks[2], width_mult, 32),
    )


def yolo_nas_pose_n_config(num_joints: int = 17) -> YoloNASPoseConfig:
    """Slim N backbone (yolo_nas_pose_n_arch_params.yaml)."""
    base = YoloNASConfig(
        stem_channels=32,
        stages=(
            StageCfg(64, 2, 32, False),
            StageCfg(128, 3, 48, False),
            StageCfg(256, 4, 64, False),
            StageCfg(512, 2, 128, False),
        ),
        spp_channels=512,
        spp_k=(5, 9, 13),
        neck1=UpStageCfg(128, 2, 48, reduce_channels=True),
        neck2=UpStageCfg(64, 2, 32, reduce_channels=True),
        neck3=DownStageCfg(128, 2, 48),
        neck4=DownStageCfg(256, 2, 48),
        heads=(),  # pose heads used instead
        num_classes=1,
    )
    return YoloNASPoseConfig(base=base, heads=_pose_heads(0.33), num_joints=num_joints)


def yolo_nas_pose_s_config(num_joints: int = 17) -> YoloNASPoseConfig:
    return YoloNASPoseConfig(base=yolo_nas_s_config(1), heads=_pose_heads(0.5), num_joints=num_joints)


def yolo_nas_pose_m_config(num_joints: int = 17) -> YoloNASPoseConfig:
    return YoloNASPoseConfig(base=yolo_nas_m_config(1), heads=_pose_heads(0.75), num_joints=num_joints)


def yolo_nas_pose_l_config(num_joints: int = 17) -> YoloNASPoseConfig:
    return YoloNASPoseConfig(base=yolo_nas_l_config(1), heads=_pose_heads(1.0), num_joints=num_joints)


def yolo_nas_pose_config_from_arch_params(arch_params, num_joints=None) -> "YoloNASPoseConfig":
    """Translate the REFERENCE pose arch_params YAML schema
    (recipes/arch_params/yolo_nas_pose_*_arch_params.yaml: NStageBackbone /
    YoloNASPANNeckWithC2 spec shared with the detector + YoloNASPoseNDFLHeads
    heads_list) into a :class:`YoloNASPoseConfig` — pose detectors reshapeable
    purely from YAML like the reference's CustomizableDetector."""
    from super_gradients_tpu.models.detection.customizable_detector import yolo_nas_config_from_arch_params

    base = yolo_nas_config_from_arch_params({k: v for k, v in arch_params.items() if k != "heads"}, 1)
    hspec = arch_params.get("heads", {}).get("YoloNASPoseNDFLHeads", {})
    nj = num_joints or hspec.get("num_classes") or 17
    heads = []
    for entry in hspec.get("heads_list", []):
        (hname, hp), = entry.items() if isinstance(entry, dict) else ((entry, {}),)
        heads.append(PoseHeadCfg(
            bbox_inter_channels=int(hp["bbox_inter_channels"]),
            pose_inter_channels=int(hp["pose_inter_channels"]),
            pose_regression_blocks=int(hp.get("pose_regression_blocks", 2)),
            width_mult=float(hp.get("width_mult", 1.0)),
            stride=int(hp["stride"]),
        ))
    if not heads:
        heads = list(_pose_heads(1.0))
    return YoloNASPoseConfig(
        base=base, heads=tuple(heads), num_joints=int(nj),
        reg_max=int(hspec.get("reg_max", 16)),
        pose_offset_multiplier=float(hspec.get("pose_offset_multiplier", 1.0)),
        compensate_grid_cell_offset=bool(hspec.get("compensate_grid_cell_offset", True)),
    )
