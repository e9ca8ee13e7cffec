"""String-factory detector composition (ref customizable_detector.py:30-140 +
``detection_modules.py``).

The reference lets recipes assemble a detector from REGISTERED module names::

    backbone: {NStageBackbone: {stem_channels: 48, stages: [...], ...}}
    neck:     {YoloNASPANNeckWithC2: {neck1: {...}, ..., neck4: {...}}}
    heads:    {NDFLHeads: {num_classes: 80, heads: [...]}}

Here each registered entry in ``DETECTION_MODULES`` is a BUILDER: a callable
``params_dict -> flax module`` whose instance follows the detector part protocol —
backbone ``(x, train) -> [feats]``, neck ``(feats, train) -> [p3, p4, p5]``,
heads ``(feats, train) -> outputs``. :class:`CustomizableDetector` resolves the
three specs at construction (flax modules are plain dataclasses, so building them
from strings is pure) and chains them. Unknown names raise with the list of
registered choices, mirroring the reference factory error.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple, Union

import flax.linen as nn

from super_gradients_tpu.common.registry import DETECTION_MODULES, register_detection_module
from super_gradients_tpu.models.detection.yolo_nas import (
    DownStageCfg,
    HeadCfg,
    NDFLHeads,
    NStageBackbone,
    StageCfg,
    UpStageCfg,
    YoloNASConfig,
    YoloNASPANNeckWithC2,
    yolo_nas_s_config,
)

Spec = Union[str, Tuple[str, Mapping], Mapping]


def parse_module_spec(spec: Spec) -> Tuple[str, Dict[str, Any]]:
    """Accept ``"Name"``, ``("Name", params)`` or ``{"Name": params}`` (YAML form)."""
    if isinstance(spec, str):
        return spec, {}
    if isinstance(spec, tuple) and len(spec) == 2:
        return spec[0], dict(spec[1] or {})
    if isinstance(spec, Mapping):
        if len(spec) != 1:
            raise ValueError(f"module spec must have exactly one top-level key, got {list(spec)}")
        name, params = next(iter(spec.items()))
        return name, dict(params or {})
    raise TypeError(f"bad module spec: {spec!r}")


def build_detection_module(spec: Spec, **extra) -> nn.Module:
    """Resolve a registered detection-module builder by name and instantiate it."""
    name, params = parse_module_spec(spec)
    if name not in DETECTION_MODULES:
        raise KeyError(
            f"unknown detection module `{name}`; registered: {sorted(DETECTION_MODULES)}"
        )
    params.update(extra)
    return DETECTION_MODULES[name](params)


class CustomizableDetector(nn.Module):
    """backbone → neck → heads, each resolved by registered name
    (ref customizable_detector.py:30-95)."""

    backbone: Spec
    heads: Spec
    neck: Optional[Spec] = None
    num_classes: Optional[int] = None

    def setup(self):
        self._backbone = build_detection_module(self.backbone)
        self._neck = build_detection_module(self.neck) if self.neck is not None else None
        extra = {"num_classes": self.num_classes} if self.num_classes is not None else {}
        self._heads = build_detection_module(self.heads, **extra)

    def __call__(self, x, train: bool = False):
        feats = self._backbone(x, train=train)
        if self._neck is not None:
            feats = self._neck(feats, train=train)
        return self._heads(feats, train=train)


def yolo_nas_config_from_arch_params(arch_params: Mapping, num_classes: Optional[int] = None) -> YoloNASConfig:
    """Translate the REFERENCE arch_params YAML schema
    (recipes/arch_params/yolo_nas_*_arch_params.yaml: nested
    ``backbone: {NStageBackbone: {stem/stages/context_module}}``,
    ``neck: {YoloNASPANNeckWithC2: {neck1..4}}``,
    ``heads: {NDFLHeads: {heads_list}}``) into a :class:`YoloNASConfig`, so
    YOLO-NAS detectors are reshapeable purely from YAML like the reference's
    CustomizableDetector."""

    def inner(spec):
        _, params = parse_module_spec(spec)
        return params

    bb = inner(arch_params["backbone"])
    stem = inner(bb["stem"])
    stages = [inner(s) for s in bb["stages"]]
    spp = inner(bb["context_module"])
    neck = inner(arch_params["neck"])
    up1, up2 = inner(neck["neck1"]), inner(neck["neck2"])
    dn3, dn4 = inner(neck["neck3"]), inner(neck["neck4"])
    # "heads" may be absent when the caller replaces the head family entirely
    # (yolo_nas_pose_config_from_arch_params parses YoloNASPoseNDFLHeads itself
    # and reuses this function for the shared backbone+neck spec only)
    heads = inner(arch_params["heads"]) if "heads" in arch_params else {}
    head_list = [inner(h) for h in heads.get("heads_list", [])]

    def stage_cfg(p):
        return StageCfg(
            out_channels=p["out_channels"], num_blocks=p["num_blocks"],
            hidden_channels=p["hidden_channels"],
            concat_intermediates=bool(p.get("concat_intermediates", False)),
            act=p.get("activation_type", "relu"),
        )

    def up_cfg(p):
        return UpStageCfg(
            out_channels=p["out_channels"], num_blocks=p["num_blocks"],
            hidden_channels=p["hidden_channels"],
            width_mult=float(p.get("width_mult", 1.0)), depth_mult=float(p.get("depth_mult", 1.0)),
            reduce_channels=bool(p.get("reduce_channels", True)), act=p.get("activation_type", "relu"),
        )

    def dn_cfg(p):
        return DownStageCfg(
            out_channels=p["out_channels"], num_blocks=p["num_blocks"],
            hidden_channels=p["hidden_channels"],
            width_mult=float(p.get("width_mult", 1.0)), depth_mult=float(p.get("depth_mult", 1.0)),
            act=p.get("activation_type", "relu"),
        )

    def head_cfg(p):
        return HeadCfg(
            inter_channels=p["inter_channels"], width_mult=float(p["width_mult"]),
            stride=p["stride"], first_conv_group_size=int(p.get("first_conv_group_size", 0)),
        )

    return YoloNASConfig(
        stem_channels=stem["out_channels"],
        stages=tuple(stage_cfg(s) for s in stages),
        spp_channels=spp["output_channels"],
        spp_k=tuple(spp.get("k", (5, 9, 13))),
        neck1=up_cfg(up1), neck2=up_cfg(up2), neck3=dn_cfg(dn3), neck4=dn_cfg(dn4),
        heads=tuple(head_cfg(h) for h in head_list),
        num_classes=num_classes or heads.get("num_classes") or 80,
        reg_max=int(heads.get("reg_max", 16)),
        in_channels=int(arch_params.get("in_channels", 3)),
        bn_eps=float(arch_params.get("bn_eps", 1e-3)),
        bn_momentum=float(arch_params.get("bn_momentum", 0.03)),
    )


# ------------------------------------------------------------------- builders
# Each builder takes the reference YAML param names and produces a flax module.
# YOLO-NAS parts share one YoloNASConfig dataclass internally; unused fields are
# defaulted from the S config so each part can be built independently.


def _stage(d: Mapping) -> StageCfg:
    return StageCfg(**dict(d))


@register_detection_module("NStageBackbone")
def _build_nstage_backbone(params: Mapping) -> nn.Module:
    base = yolo_nas_s_config()
    cfg = YoloNASConfig(
        stem_channels=params.get("stem_channels", base.stem_channels),
        stages=tuple(_stage(s) for s in params["stages"]) if "stages" in params else base.stages,
        spp_channels=params.get("spp_channels", base.spp_channels),
        spp_k=tuple(params.get("spp_k", base.spp_k)),
        neck1=base.neck1, neck2=base.neck2, neck3=base.neck3, neck4=base.neck4,
        heads=base.heads,
        bn_eps=params.get("bn_eps", base.bn_eps),
        fused=params.get("fused", "none"),
    )
    return NStageBackbone(cfg)


@register_detection_module("YoloNASPANNeckWithC2")
def _build_yolo_nas_neck(params: Mapping) -> nn.Module:
    base = yolo_nas_s_config()
    cfg = YoloNASConfig(
        stem_channels=base.stem_channels, stages=base.stages,
        spp_channels=base.spp_channels, spp_k=base.spp_k,
        neck1=UpStageCfg(**params["neck1"]) if "neck1" in params else base.neck1,
        neck2=UpStageCfg(**params["neck2"]) if "neck2" in params else base.neck2,
        neck3=DownStageCfg(**params["neck3"]) if "neck3" in params else base.neck3,
        neck4=DownStageCfg(**params["neck4"]) if "neck4" in params else base.neck4,
        heads=base.heads,
        bn_eps=params.get("bn_eps", base.bn_eps),
        fused=params.get("fused", "none"),
    )
    return YoloNASPANNeckWithC2(cfg)


@register_detection_module("NDFLHeads")
def _build_ndfl_heads(params: Mapping) -> nn.Module:
    base = yolo_nas_s_config()
    cfg = YoloNASConfig(
        stem_channels=base.stem_channels, stages=base.stages,
        spp_channels=base.spp_channels, spp_k=base.spp_k,
        neck1=base.neck1, neck2=base.neck2, neck3=base.neck3, neck4=base.neck4,
        heads=tuple(HeadCfg(**h) for h in params["heads"]) if "heads" in params else base.heads,
        num_classes=params.get("num_classes", base.num_classes),
        reg_max=params.get("reg_max", base.reg_max),
        bn_eps=params.get("bn_eps", base.bn_eps),
    )
    return NDFLHeads(cfg)


def _tuplify(params: Mapping) -> Dict[str, Any]:
    return {k: tuple(v) if isinstance(v, list) else v for k, v in params.items()}


@register_detection_module("CSPResNetBackbone")
def _build_cspresnet_backbone(params: Mapping) -> nn.Module:
    from super_gradients_tpu.models.detection.pp_yolo_e import CSPResNetBackbone

    return CSPResNetBackbone(**_tuplify(params))


@register_detection_module("PPYoloECSPPAN")
def _build_ppyoloe_pan(params: Mapping) -> nn.Module:
    from super_gradients_tpu.models.detection.pp_yolo_e import PPYoloECSPPAN

    return PPYoloECSPPAN(**_tuplify(params))
