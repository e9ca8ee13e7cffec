"""PyTorch checkpoint → flax variables converter.

The reference distributes ~60 pretrained ``.pth`` checkpoints
(``training/pretrained_models.py``); this module ingests them into the TPU models.
Layout transforms:

- conv weight       OIHW → HWIO
- grouped conv      O(I/g)HW → HW(I/g)O  (same transpose)
- conv-transpose2x2 [in,out,kh,kw] → [kh,kw,in,out]
- linear            [out,in] → [in,out]
- BatchNorm         weight→scale, bias→bias, running_mean/var→batch_stats

Name translation is rule-based: the flax module trees in this repo intentionally
mirror the reference attribute names (``branch_3x3_conv`` ↔ ``branch_3x3.conv``,
``layer1_0`` ↔ ``layer1.0``), so a small set of regex rules per model family maps
every leaf. ``convert_state_dict`` validates shape-compatibility leaf-by-leaf and
reports all misses at once (analogue of the reference's adaptive
``checkpoint_utils.py:79`` loader with StrictLoad modes).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)

Rules = Sequence[Tuple[str, str]]


class StrictLoad:
    """Checkpoint-load strictness modes (ref common/data_types/enum/strict_load.py:4-22)."""

    OFF = "off"  # keep template values for misses
    ON = "on"  # raise on any miss
    NO_KEY_MATCHING = "no_key_matching"  # match remaining leaves to unused torch keys by shape, in order
    KEY_MATCHING = "key_matching"  # match remaining leaves to unused torch keys by name suffix (prefix-agnostic)

    ALL = (OFF, ON, NO_KEY_MATCHING, KEY_MATCHING)

    @staticmethod
    def normalize(strict) -> str:
        """Map the checkpoint_params.strict_load surface (bool | mode string) to a
        mode. Unknown strings raise instead of silently behaving as another mode
        — every reference StrictLoad enum value is truthy, so treating them as a
        boolean would turn e.g. 'no_key_matching' into strict=ON."""
        if isinstance(strict, str):
            mode = strict.lower()
            if mode in ("true", "false"):  # YAML bools that arrived as strings
                mode = StrictLoad.ON if mode == "true" else StrictLoad.OFF
            if mode not in StrictLoad.ALL:
                raise ValueError(f"Unknown strict_load mode {strict!r}; valid: {StrictLoad.ALL}")
            return mode
        return StrictLoad.ON if strict else StrictLoad.OFF

# applied to dotted flax path AFTER model-specific rules
_GENERIC_RULES: Rules = (
    # bottlenecks_0 -> bottlenecks.0, layer1_0 -> layer1.0, fpn_stages_0_0 -> fpn_stages.0.0
    (r"_(\d+)(?=[._]|$)", r".\1"),
    # model rules write `§` where a literal underscore-digit must survive the rule above
    (r"§", "_"),
)

_LEAF_MAP = {
    "scale": "weight",  # BN gamma
    "mean": "running_mean",
    "var": "running_var",
    "kernel": "weight",
    "bias": "bias",
    "alpha": "",  # path already ends with .alpha in torch (a bare Parameter)
}


def _translate(path: Tuple[str, ...], rules: Rules) -> str:
    *parents, leaf = path
    name = ".".join(parents)
    for pat, repl in tuple(rules) + tuple(_GENERIC_RULES):
        name = re.sub(pat, repl, name)
    torch_leaf = _LEAF_MAP.get(leaf, leaf)
    if leaf == "alpha":
        return name + ".alpha" if name else "alpha"
    return f"{name}.{torch_leaf}" if name else torch_leaf


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _transform(value: np.ndarray, flax_leaf_shape: Tuple[int, ...], path: Tuple[str, ...]) -> np.ndarray:
    leaf = path[-1]
    parent = path[-2] if len(path) > 1 else ""
    if leaf == "kernel":
        if value.ndim == 4:
            if "upsample" in parent or "up_conv_list" in parent:
                # ConvTranspose2d [in,out,kh,kw] -> [kh,kw,in,out] (yolo_nas neck
                # upsample / ShelfNetHW up_conv_list)
                out = value.transpose(2, 3, 0, 1)
            else:  # Conv2d OIHW -> HWIO
                out = value.transpose(2, 3, 1, 0)
        elif value.ndim == 2:  # Linear [out,in] -> [in,out]
            out = value.T
            if tuple(flax_leaf_shape) == (1, 1) + out.shape:
                out = out.reshape((1, 1) + out.shape)  # torch Linear -> flax 1x1 conv
        else:
            out = value
    else:
        out = value
    if tuple(out.shape) != tuple(flax_leaf_shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: torch {out.shape} vs flax {flax_leaf_shape}")
    return out


def _flatten(tree: Mapping, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    flat = {}
    for k, v in tree.items():
        p = prefix + (str(k),)
        if isinstance(v, Mapping):
            flat.update(_flatten(v, p))
        else:
            flat[p] = v
    return flat


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def convert_state_dict(
    state_dict: Mapping[str, Any],
    variables_template: Mapping,
    rules: Rules = (),
    strict: bool = True,
    torch_prefix: str = "",
) -> Dict:
    """Convert a torch state_dict into a flax variables dict matching the template.

    Args:
        state_dict: torch ``name -> tensor`` map (or a full checkpoint dict with
            ``net``/``ema_net`` keys — pass the inner dict).
        variables_template: the model's initialized variables (shapes to match).
        rules: model-specific (regex, replacement) name rules applied first.
        strict: raise on any missing/mismatched key (StrictLoad.ON analogue);
            ``False`` keeps template values for misses (StrictLoad.OFF).
    """
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in state_dict.items()}
    if torch_prefix:
        sd = {k[len(torch_prefix):]: v for k, v in sd.items() if k.startswith(torch_prefix)}

    out_flat: Dict[Tuple[str, ...], Any] = {}
    missing: List[str] = []
    missing_paths: List[Tuple[Tuple[str, ...], Any]] = []
    used_torch_keys = set()

    for collection, tree in variables_template.items():
        flat = _flatten(tree, (collection,))
        for path, leaf_val in flat.items():
            model_path = path[1:]  # drop collection name
            torch_key = _translate(model_path, rules)
            if torch_key in sd:
                arr = _transform(_to_numpy(sd[torch_key]), tuple(np.shape(leaf_val)), model_path)
                out_flat[path] = arr.astype(np.asarray(leaf_val).dtype if hasattr(leaf_val, "dtype") else np.float32)
                used_torch_keys.add(torch_key)
            else:
                missing.append(f"{'/'.join(path)} (wanted torch key `{torch_key}`)")
                missing_paths.append((path, leaf_val))
                out_flat[path] = leaf_val

    mode = StrictLoad.normalize(strict)

    if mode == StrictLoad.KEY_MATCHING and missing_paths:
        # prefix-agnostic name matching: a checkpoint saved under an extra module
        # prefix (wrapper nets, DDP-style naming) still loads by layer-name suffix
        # (ref checkpoint_utils.py:79 KEY_MATCHING mode)
        remaining = {k: v for k, v in sd.items() if k not in used_torch_keys and not k.endswith("num_batches_tracked")}
        matched = 0
        still_missing = []
        for path, leaf_val in missing_paths:
            torch_key = _translate(path[1:], rules)
            hit = None
            for k in remaining:
                if k != torch_key and not k.endswith("." + torch_key):
                    continue
                try:
                    arr = _transform(_to_numpy(remaining[k]), tuple(np.shape(leaf_val)), path[1:])
                except ValueError:
                    continue
                hit = (k, arr)
                break
            if hit is not None:
                out_flat[path] = hit[1].astype(np.asarray(leaf_val).dtype if hasattr(leaf_val, "dtype") else np.float32)
                used_torch_keys.add(hit[0])
                del remaining[hit[0]]
                matched += 1
            else:
                still_missing.append(f"{'/'.join(path)} (wanted suffix `{torch_key}`)")
        logger.info(f"KEY_MATCHING: suffix-matched {matched}/{len(missing_paths)} leaves")
        missing = still_missing

    if mode == StrictLoad.NO_KEY_MATCHING and missing_paths:
        # shape-based sequential matching against still-unused torch keys
        # (ref checkpoint_utils.py:79 adaptive solver)
        remaining = [(k, v) for k, v in sd.items() if k not in used_torch_keys and not k.endswith("num_batches_tracked")]
        matched = 0
        for path, leaf_val in missing_paths:
            model_path = path[1:]
            for k, v in remaining:
                try:
                    arr = _transform(_to_numpy(v), tuple(np.shape(leaf_val)), model_path)
                except ValueError:
                    continue
                out_flat[path] = arr
                used_torch_keys.add(k)
                remaining = [(kk, vv) for kk, vv in remaining if kk != k]
                matched += 1
                break
        logger.info(f"NO_KEY_MATCHING: shape-matched {matched}/{len(missing_paths)} leaves")
        missing = []  # lenient beyond this point (unmatched leaves keep template values)

    unused = [k for k in sd if k not in used_torch_keys and not k.endswith("num_batches_tracked")]
    if missing:
        msg = f"{len(missing)} flax leaves had no torch counterpart, e.g.:\n  " + "\n  ".join(missing[:10])
        if mode == StrictLoad.ON:
            raise KeyError(msg + (f"\nUnused torch keys e.g.: {unused[:10]}" if unused else ""))
        logger.warning(msg)
    if unused:
        logger.info(f"{len(unused)} torch keys unused, e.g. {unused[:5]}")

    return _unflatten(out_flat)


# ------------------------------------------------------------ per-model rules


RESNET_RULES: Rules = (
    (r"shortcut_conv", "shortcut.0"),
    (r"shortcut_bn", "shortcut.1"),
)


YOLO_NAS_RULES: Rules = (
    # QARepVGG branch naming
    (r"branch_3x3_conv", "branch_3x3.conv"),
    (r"branch_3x3_bn", "branch_3x3.bn"),
    # heads use ConvBNReLU (-> .seq.conv/.seq.bn) and Sequential-wrapped convs
    (r"(head\d\.stem)\.conv", r"\1.seq.conv"),
    (r"(head\d\.stem)\.bn", r"\1.seq.bn"),
    (r"(head\d\.(?:cls|reg)_convs)\.conv", r"\1.0.seq.conv"),
    (r"(head\d\.(?:cls|reg)_convs)\.bn", r"\1.0.seq.bn"),
)


PPYOLOE_RULES: Rules = (
    # reference ConvBNAct nests conv/bn under a `seq` Sequential
    # (modules/conv_bn_act_block.py:44-66); ours names them directly
    (r"(?<!seq)\.(conv|bn)$", r".seq.\1"),
    # classic RepVGG branches (modules/repvgg_block.py:62-75)
    (r"branch_3x3_conv", "branch_3x3.conv"),
    (r"branch_3x3_bn", "branch_3x3.bn"),
    (r"branch_1x1_conv", "branch_1x1.conv"),
    (r"branch_1x1_bn", "branch_1x1.bn"),
    (r"identity_bn", "no_conv_branch"),
    # CSPStage mid-sequence SPP insert is named "spp" (pp_yolo_e/pan.py:55)
    (r"convs_spp", "convs.spp"),
    # backbone stem Sequential (csp_resnet.py:152-193)
    (r"stem_conv(\d)", r"stem.conv\1"),
    # EffectiveSEBlock projection conv (modules/se_blocks.py:36)
    (r"attn\.fc", "attn.project"),
    # ESEAttn head stems (pp_yolo_head.py:79-93)
    (r"stem_(cls|reg)_(\d+)_fc", r"stem_\1.\2.fc"),
    (r"stem_(cls|reg)_(\d+)_conv", r"stem_\1.\2.conv"),
)


# Reference YOLOX is a flat indexed ModuleList (yolo_base.py:395-430 comments 10-24
# restart at 0 in the state_dict; csp_darknet53.py:204-229 backbone indices 0-9);
# our flax modules use semantic names — map them to the flat indices.
YOLOX_RULES: Rules = (
    (r"^backbone\.stem", "_backbone._modules_list.0"),
    (r"^backbone\.dark2_conv", "_backbone._modules_list.1"),
    (r"^backbone\.dark2_csp", "_backbone._modules_list.2"),
    (r"^backbone\.dark3_conv", "_backbone._modules_list.3"),
    (r"^backbone\.dark3_csp", "_backbone._modules_list.4"),
    (r"^backbone\.dark4_conv", "_backbone._modules_list.5"),
    (r"^backbone\.dark4_csp", "_backbone._modules_list.6"),
    (r"^backbone\.dark5_conv", "_backbone._modules_list.7"),
    (r"^backbone\.dark5_spp", "_backbone._modules_list.8"),
    (r"^backbone\.dark5_csp", "_backbone._modules_list.9"),
    (r"^lateral5", "_head._modules_list.0"),
    (r"^fpn_c4", "_head._modules_list.3"),
    (r"^lateral4", "_head._modules_list.4"),
    (r"^fpn_c3", "_head._modules_list.7"),
    (r"^down3", "_head._modules_list.8"),
    (r"^pan_c4", "_head._modules_list.10"),
    (r"^down4", "_head._modules_list.11"),
    (r"^pan_c5", "_head._modules_list.13"),
    (r"^head(\d)_stem", r"_head._modules_list.14.stems.\1"),
    (r"^head(\d)_cls1", r"_head._modules_list.14.cls_convs.\1.0"),
    (r"^head(\d)_cls2", r"_head._modules_list.14.cls_convs.\1.1"),
    (r"^head(\d)_reg1", r"_head._modules_list.14.reg_convs.\1.0"),
    (r"^head(\d)_reg2", r"_head._modules_list.14.reg_convs.\1.1"),
    (r"^head(\d)_cls_pred", r"_head._modules_list.14.cls_preds.\1"),
    (r"^head(\d)_reg_pred", r"_head._modules_list.14.reg_preds.\1"),
    (r"^head(\d)_obj_pred", r"_head._modules_list.14.obj_preds.\1"),
    # CSPLayer bottleneck sequence (csp_darknet53.py:100-104)
    (r"\.b(\d+)_cv", r".bottlenecks.\1.cv"),
)


def resnet_key_mapper():
    return RESNET_RULES


def yolo_nas_key_mapper():
    return YOLO_NAS_RULES


# pose heads add ConvBNReLU stems + a pose_convs Sequential
# (yolo_nas_pose_dfl_head.py:84-101; shared_stem=False in all shipped variants)
YOLO_NAS_POSE_RULES: Rules = YOLO_NAS_RULES + (
    (r"(head\d\.(?:pose|bbox)_stem)\.conv$", r"\1.seq.conv"),
    (r"(head\d\.(?:pose|bbox)_stem)\.bn$", r"\1.seq.bn"),
    (r"(head\d)\.pose_convs_(\d+)\.conv$", r"\1.pose_convs.\2.seq.conv"),
    (r"(head\d)\.pose_convs_(\d+)\.bn$", r"\1.pose_convs.\2.seq.bn"),
    # our heads are top-level; the reference nests them under the NDFL `heads` module
    (r"^head(\d)", r"heads.head\1"),
)


def yolo_nas_pose_key_mapper():
    return YOLO_NAS_POSE_RULES


def ppyoloe_key_mapper():
    return PPYOLOE_RULES


def yolox_key_mapper():
    return YOLOX_RULES


VIT_RULES: Rules = (
    # reference vit.py:19-44 PatchEmbed wraps the conv as .proj
    (r"^patch_embed\b", "patch_embedding.proj"),
    (r"^block_(\d+)", r"transformer.blocks.\1"),
    (r"\.mlp_fc(\d)", r".mlp.fc\1"),
    (r"^norm$", "pre_head_norm"),
)


def vit_key_mapper():
    return VIT_RULES


def _ddrnet_dappm_down_scale(m):
    """DAPPMBranch down_scale Sequential index depends on the branch's stride
    (ddrnet.py:61-75): branch 0 (stride 1) has no pooling layer, so BN/conv sit at
    0/2; all other branches have a pooling layer first → 1/3."""
    b = int(m.group(1))
    bn_i, conv_i = (0, 2) if b == 0 else (1, 3)
    return f"spp.branches.{b}.down_scale.{bn_i if m.group(2) == 'bn' else conv_i}"


DDRNET_RULES: Rules = (
    # backbone-owned layers (ddrnet.py:218-232 BasicDDRBackBone)
    (r"^stem_(\d)\.conv$", r"_backbone.stem.\1.0"),
    (r"^stem_(\d)\.bn$", r"_backbone.stem.\1.1"),
    (r"^layer3_(\d+)", r"_backbone.layer3.\1"),
    (r"^layer([124])_(\d+)", r"_backbone.layer\1.\2"),
    # ConvBN = Sequential(conv, bn) (ddrnet.py:23-28)
    (r"^down3_(\d+)\.conv$", r"down3.\1.0"),
    (r"^down3_(\d+)\.bn$", r"down3.\1.1"),
    (r"^compression3_(\d+)\.conv$", r"compression3.\1.0"),
    (r"^compression3_(\d+)\.bn$", r"compression3.\1.1"),
    (r"^compression4\.conv$", "compression4.0"),
    (r"^compression4\.bn$", "compression4.1"),
    (r"^down4_(\d)\.conv$", r"down4.\1.0"),
    (r"^down4_(\d)\.bn$", r"down4.\1.1"),
    # DAPPM (ddrnet.py:44-138)
    (r"^spp\.branch_(\d)\.(bn|conv)$", _ddrnet_dappm_down_scale),
    (r"^spp\.branch_(\d)\.process_bn$", r"spp.branches.\1.process.0"),
    (r"^spp\.branch_(\d)\.process_conv$", r"spp.branches.\1.process.2"),
    (r"^spp\.compression_bn$", "spp.compression.0"),
    (r"^spp\.compression_conv$", "spp.compression.2"),
    (r"^spp\.shortcut_bn$", "spp.shortcut.0"),
    (r"^spp\.shortcut_conv$", "spp.shortcut.2"),
    # residual-block shortcuts (classification resnet blocks)
    (r"shortcut_conv", "shortcut.0"),
    (r"shortcut_bn", "shortcut.1"),
)


def ddrnet_key_mapper():
    return DDRNET_RULES


# classic RepVGG blocks: both branches are Sequential(conv, bn), identity is a bare
# BN named no_conv_branch (modules/repvgg_block.py:62-75)
REPVGG_RULES: Rules = (
    (r"branch_3x3_conv", "branch_3x3.conv"),
    (r"branch_3x3_bn", "branch_3x3.bn"),
    (r"branch_1x1_conv", "branch_1x1.conv"),
    (r"branch_1x1_bn", "branch_1x1.bn"),
    (r"identity_bn", "no_conv_branch"),
)


def repvgg_key_mapper():
    return REPVGG_RULES


# torchvision-style DenseNet tree under `features` (densenet.py:22-118)
DENSENET_RULES: Rules = (
    (r"^denseblock(\d)_layer(\d+)", r"features.denseblock\1.denselayer\2"),
    (r"^transition(\d)_norm$", r"features.transition\1.norm"),
    (r"^transition(\d)_conv$", r"features.transition\1.conv"),
    (r"^conv0$", "features.conv0"),
    (r"^norm0$", "features.norm0"),
    (r"^norm5$", "features.norm5"),
)


def densenet_key_mapper():
    return DENSENET_RULES


# RegNet: net.stem / net.stage_{i}.blocks.block_{j} Sequential indices
# (regnet.py:36-148); `§` guards the literal underscores in stage_/block_
REGNET_RULES: Rules = (
    (r"^stem\.conv$", "net.stem.conv"),
    (r"^stem\.bn$", "net.stem.bn"),
    (r"^stage_(\d+)_(\d+)", r"net.stage§\1.blocks.block§\2"),
    (r"\.conv1\.conv$", ".conv_block§1.0"),
    (r"\.conv1\.bn$", ".conv_block§1.1"),
    (r"\.conv2\.conv$", ".conv_block§2.0"),
    (r"\.conv2\.bn$", ".conv_block§2.1"),
    (r"\.conv3\.conv$", ".conv_block§3.0"),
    (r"\.conv3\.bn$", ".conv_block§3.1"),
    (r"\.se\.fc1$", ".se.1"),
    (r"\.se\.fc2$", ".se.3"),
    (r"\.shortcut\.conv$", ".shortcut.0"),
    (r"\.shortcut\.bn$", ".shortcut.1"),
    (r"^fc$", "net.head.fc"),
)


def regnet_key_mapper():
    return REGNET_RULES


def _mnv2_block_index(m):
    """MobileNetV2 InvertedResidual conv Sequential indices (mobilenetv2.py:70-93):
    expand_ratio==1 blocks (only block 0) have no pw-expand, shifting indices."""
    i, child, leaf = int(m.group(1)), m.group(2), m.group(3)
    if i == 0:
        idx = {("depthwise", "conv"): 0, ("depthwise", "bn"): 1,
               ("project", "conv"): 3, ("project", "bn"): 4}[(child, leaf)]
    else:
        idx = {("expand", "conv"): 0, ("expand", "bn"): 1,
               ("depthwise", "conv"): 3, ("depthwise", "bn"): 4,
               ("project", "conv"): 6, ("project", "bn"): 7}[(child, leaf)]
    return f"features.{i + 1}.conv.{idx}"


MOBILENET_V2_RULES: Rules = (
    (r"^block_(\d+)\.(expand|depthwise|project)\.(conv|bn)$", _mnv2_block_index),
    (r"^stem\.conv$", "features.0.0"),
    (r"^stem\.bn$", "features.0.1"),
    (r"^head_conv\.conv$", "features.18.0"),
    (r"^head_conv\.bn$", "features.18.1"),
    (r"^classifier$", "classifier.1"),  # Sequential(Dropout, Linear)
)


def mobilenet_v2_key_mapper():
    return MOBILENET_V2_RULES


# ShelfNet (ref segmentation_models/shelfnet.py): the trunk is a plain reference
# ResNet under `backbone`; ConvBNReLU/ARM/NetOutput attribute names match the flax
# module names directly, so only the stem + FCNHead Sequential need rules.
SHELFNET_RULES: Rules = RESNET_RULES + (
    (r"^backbone\.conv1\.conv$", "backbone.conv1"),
    (r"^backbone\.conv1\.bn$", "backbone.bn1"),
    (r"^aux_head_fcn", "aux_head.fcn"),
)


def shelfnet_key_mapper():
    return SHELFNET_RULES


# MobileNetV1 classifier (ref classification_models/mobilenet.py:13-64)
MOBILENET_V1_RULES: Rules = (
    (r"^layers_(\d+)_(conv\d|bn\d)$", r"layers.\1.\2"),
)


def mobilenet_v1_key_mapper():
    return MOBILENET_V1_RULES


# STDC classification (ref stdc.py:237-299): same backbone as the seg model but
# NOT nested under `cp.`, plus conv_last/fc/linear head
STDC_CLS_RULES: Rules = (
    (r"^backbone\.block_s(\d+)_0\.conv_list_1_dw\.(conv|bn)$", r"backbone.stages.block§s\1.0.conv_list.1.0.seq.\2"),
    (r"^backbone\.block_s(\d+)_0\.conv_list_1\.(conv|bn)$", r"backbone.stages.block§s\1.0.conv_list.1.1.seq.\2"),
    (r"^backbone\.block_s(\d+)_(\d+)\.conv_list_(\d+)\.(conv|bn)$", r"backbone.stages.block§s\1.\2.conv_list.\3.seq.\4"),
    (r"^backbone\.block_s(\d+)_(\d+)\.(conv|bn)$", r"backbone.stages.block§s\1.\2.seq.\3"),
    (r"^conv_last\.(conv|bn)$", r"conv_last.seq.\1"),
)


def stdc_cls_key_mapper():
    return STDC_CLS_RULES


# Darknet53 classifier (ref detection_models/darknet53.py:43-101): flat
# modules_list with named Conv2d/BatchNorm2d children; stages at odd/even slots.
_DN53_LEAF = {"conv": "Conv2d", "bn": "BatchNorm2d"}


def _darknet53_down(m):
    return f"modules_list.{2 * int(m.group(1)) + 1}.{_DN53_LEAF[m.group(2)]}"


def _darknet53_stage(m):
    si, bi, j, leaf = m.groups()
    return f"modules_list.{2 * int(si) + 2}.{bi}.layer{j}.{_DN53_LEAF[leaf]}"


DARKNET53_RULES: Rules = (
    (r"^stem\.(conv|bn)$", lambda m: f"modules_list.0.{_DN53_LEAF[m.group(1)]}"),
    (r"^down(\d+)\.(conv|bn)$", _darknet53_down),
    (r"^stage(\d+)_(\d+)\.conv(\d)\.(conv|bn)$", _darknet53_stage),
    (r"^fc$", "modules_list.11.fc"),
)


def darknet53_key_mapper():
    return DARKNET53_RULES


# CSPDarknet53 classifier (ref csp_darknet53.py:173-229): the yolox trunk's
# _modules_list WITHOUT the _backbone prefix, + Linear head at slot 12.
CSP_DARKNET53_CLS_RULES: Rules = tuple(
    (pat, repl.replace("_backbone.", "")) for pat, repl in (
        (r"^backbone\.stem", "_backbone._modules_list.0"),
        (r"^backbone\.dark2_conv", "_backbone._modules_list.1"),
        (r"^backbone\.dark2_csp", "_backbone._modules_list.2"),
        (r"^backbone\.dark3_conv", "_backbone._modules_list.3"),
        (r"^backbone\.dark3_csp", "_backbone._modules_list.4"),
        (r"^backbone\.dark4_conv", "_backbone._modules_list.5"),
        (r"^backbone\.dark4_csp", "_backbone._modules_list.6"),
        (r"^backbone\.dark5_conv", "_backbone._modules_list.7"),
        (r"^backbone\.dark5_spp", "_backbone._modules_list.8"),
        (r"^backbone\.dark5_csp", "_backbone._modules_list.9"),
    )
) + (
    (r"\.b(\d+)_cv", r".bottlenecks.\1.cv"),
    (r"^fc$", "_modules_list.12"),
)


def csp_darknet53_key_mapper():
    return CSP_DARKNET53_CLS_RULES


# PNASNet-A (ref classification_models/pnasnet.py:25-110; unregistered upstream
# but shipped — cells under layer1..layer5, SepConv as sep_conv1.conv1/bn1)
PNASNET_RULES: Rules = (
    (r"^stem\.conv$", "conv1"),
    (r"^stem\.bn$", "bn1"),
    (r"^cells1_(\d+)", r"layer1.\1"),
    (r"^down1\b", "layer2"),
    (r"^cells2_(\d+)", r"layer3.\1"),
    (r"^down2\b", "layer4"),
    (r"^cells3_(\d+)", r"layer5.\1"),
    (r"\.sep\.conv$", ".sep_conv1.conv1"),
    (r"\.sep\.bn$", ".sep_conv1.bn1"),
    (r"\.proj\.conv$", ".conv1"),
    (r"\.proj\.bn$", ".bn1"),
)


def pnasnet_key_mapper():
    return PNASNET_RULES


def unet_key_mapper(cfg):
    """UNET/UNetCustom (ref unet/unet.py:20-104): ConvStage blocks sit after the
    MaxPool downsample inside each stage Sequential (unet_encoder.py:137-148), so
    the torch index is offset by 1 for stride-2 stages; decoder last_convs nests
    repeats 1..n under a second Sequential (unet_decoder.py:115-119)."""
    strides = list(cfg.strides_list)

    def _stage(m):
        i, j, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        off = 1 if strides[i] == 2 else 0
        return f"encoder.backbone.stages.{i}.blocks.{j + off}.seq.{leaf}"

    def _dec(m):
        i, r, leaf = m.group(1), int(m.group(2)), m.group(3)
        slot = "0" if r == 0 else f"1.{r - 1}"
        return f"decoder.up_stages.{i}.last_convs.{slot}.seq.{leaf}"

    return (
        (r"^stage(\d+)_blk(\d+)\.(conv|bn)$", _stage),
        (r"^dec(\d+)_conv(\d+)\.(conv|bn)$", _dec),
        (r"^proj(\d+)\.(conv|bn)$", r"decoder.projection_blocks.\1.seq.\2"),
        (r"^head_conv\.(conv|bn)$", r"seg_head.0.seg_head.0.seq.\1"),
        (r"^head_pred$", "seg_head.0.seg_head.2"),
    )


# SSD assemblies (ref detection_models/ssd.py:20-57 + modules/detection_modules.py).
# The torch trunk lives under backbone.multi_output_backbone.0 (MultiOutputModule
# stores the wrapped module at key "0" — multi_output_modules.py:47).
_SSD_BB = "backbone.multi_output_backbone.0"

# SSDBottleneckNeck block Sequential: [conv1x1, BN, ReLU, convK, BN, ReLU]
_SSD_V1_NECK_IDX = {"conv1": 0, "bn1": 1, "conv2": 3, "bn2": 4}


def _ssd_v1_neck(m):
    return f"neck.neck_blocks.{m.group(1)}.{_SSD_V1_NECK_IDX[m.group(2)]}"


SSD_V1_RULES: Rules = (
    (r"^(conv1|bn1)$", _SSD_BB + r".\1"),
    (r"^layers_(\d+)_(conv\d|bn\d)$", _SSD_BB + r".layers.\1.\2"),
    (r"^neck_(\d+)_(conv\d|bn\d)$", _ssd_v1_neck),
    (r"^(loc|conf)_(\d+)$", r"heads.\1.\2"),
)


def ssd_mobilenet_v1_key_mapper():
    return SSD_V1_RULES


def _ssd_v2_block_index(m):
    # same Sequential layout as the classifier (mobilenetv2.py:70-93), prefixed
    return _SSD_BB + "." + _mnv2_block_index(m)


# SSDInvertedResidualNeck blocks always have a pw-expand (fractional expand_ratio)
_SSD_V2_NECK_IDX = {("expand", "conv"): 0, ("expand", "bn"): 1,
                    ("depthwise", "conv"): 3, ("depthwise", "bn"): 4,
                    ("project", "conv"): 6, ("project", "bn"): 7}


def _ssd_v2_neck(m):
    return f"neck.neck_blocks.{m.group(1)}.conv.{_SSD_V2_NECK_IDX[(m.group(2), m.group(3))]}"


SSD_LITE_V2_RULES: Rules = (
    (r"^block_(\d+)\.(expand|depthwise|project)\.(conv|bn)$", _ssd_v2_block_index),
    (r"^stem\.conv$", _SSD_BB + ".features.0.0"),
    (r"^stem\.bn$", _SSD_BB + ".features.0.1"),
    (r"^head_conv\.conv$", _SSD_BB + ".features.18.0"),
    (r"^head_conv\.bn$", _SSD_BB + ".features.18.1"),
    (r"^neck_(\d+)\.(expand|depthwise|project)\.(conv|bn)$", _ssd_v2_neck),
    # lite SSDHead SeperableConv2d: [dw conv(+bias), BN, ReLU, pw conv]
    (r"^(loc|conf)_(\d+)_dw$", r"heads.\1.\2.0"),
    (r"^(loc|conf)_(\d+)_dwbn$", r"heads.\1.\2.1"),
    (r"^(loc|conf)_(\d+)_pw$", r"heads.\1.\2.3"),
    (r"^(loc|conf)_(\d+)$", r"heads.\1.\2"),
)


def ssd_lite_mobilenet_v2_key_mapper():
    return SSD_LITE_V2_RULES


def _mnv3_block_index(m):
    """MobileNetV3 InvertedResidual conv Sequential indices (mobilenetv3.py:86-113):
    expand blocks are [pw,bn,act,dw,bn,SE,act,pwl,bn]; the (only) no-expand block 0
    is [dw,bn,act,SE,pwl,bn]. Identity placeholders keep SE indices fixed."""
    i, child, leaf = int(m.group(1)), m.group(2), m.group(3)
    if i == 0:
        table = {("depthwise", "conv"): 0, ("depthwise", "bn"): 1,
                 ("project", "conv"): 4, ("project", "bn"): 5}
    else:
        table = {("expand", "conv"): 0, ("expand", "bn"): 1,
                 ("depthwise", "conv"): 3, ("depthwise", "bn"): 4,
                 ("project", "conv"): 7, ("project", "bn"): 8}
    return f"features.{i + 1}.conv.{table[(child, leaf)]}"


def _mnv3_se_index(m):
    i, fc = int(m.group(1)), m.group(2)
    se_base = 3 if i == 0 else 5
    return f"features.{i + 1}.conv.{se_base}.fc.{0 if fc == 'fc1' else 2}"


MOBILENET_V3_RULES: Rules = (
    (r"^block_(\d+)\.(expand|depthwise|project)\.(conv|bn)$", _mnv3_block_index),
    (r"^block_(\d+)\.se\.(fc1|fc2)$", _mnv3_se_index),
    (r"^stem\.conv$", "features.0.0"),
    (r"^stem\.bn$", "features.0.1"),
    (r"^head_conv\.conv$", "conv.0"),
    (r"^head_conv\.bn$", "conv.1"),
    (r"^pre_classifier$", "classifier.0"),
    (r"^classifier$", "classifier.3"),
)


def mobilenet_v3_key_mapper():
    return MOBILENET_V3_RULES


# EfficientNet: flat underscore-prefixed attrs (efficientnet.py:303-512)
EFFICIENTNET_RULES: Rules = (
    (r"^stem\.conv$", "_conv_stem"),
    (r"^stem\.bn$", "_bn0"),
    (r"^block_(\d+)\.expand\.conv$", r"_blocks.\1._expand_conv"),
    (r"^block_(\d+)\.expand\.bn$", r"_blocks.\1._bn0"),
    (r"^block_(\d+)\.depthwise\.conv$", r"_blocks.\1._depthwise_conv"),
    (r"^block_(\d+)\.depthwise\.bn$", r"_blocks.\1._bn1"),
    (r"^block_(\d+)\.se\.fc1$", r"_blocks.\1._se_reduce"),
    (r"^block_(\d+)\.se\.fc2$", r"_blocks.\1._se_expand"),
    (r"^block_(\d+)\.project\.conv$", r"_blocks.\1._project_conv"),
    (r"^block_(\d+)\.project\.bn$", r"_blocks.\1._bn2"),
    (r"^head_conv\.conv$", "_conv_head"),
    (r"^head_conv\.bn$", "_bn1"),
    (r"^fc$", "_fc"),
)


def efficientnet_key_mapper():
    return EFFICIENTNET_RULES


def _seg_stage(fmt):
    def repl(m):
        return fmt.format(s=int(m.group(1)) + 1, b=int(m.group(2)) if m.lastindex > 1 else 0)

    return repl


# SegFormer: MiT backbone registered as patch_embed{i}/block{i}/norm{i} (1-based,
# segformer.py:201-240) under `_backbone`, head under `decode_head` (:362-373)
SEGFORMER_RULES: Rules = (
    (r"^patch_embed(\d)$", _seg_stage("_backbone.patch_embed{s}.proj")),
    (r"^embed_norm(\d)$", _seg_stage("_backbone.patch_embed{s}.norm")),
    (r"^attn(\d)_(\d+)\.sr_norm$", _seg_stage("_backbone.block{s}.{b}.attn.norm")),
    (r"^attn(\d)_(\d+)", _seg_stage("_backbone.block{s}.{b}.attn")),
    (r"^norm1_(\d)_(\d+)$", _seg_stage("_backbone.block{s}.{b}.norm1")),
    (r"^norm2_(\d)_(\d+)$", _seg_stage("_backbone.block{s}.{b}.norm2")),
    (r"^ffn(\d)_(\d+)", _seg_stage("_backbone.block{s}.{b}.mlp")),
    (r"^out_norm(\d)$", _seg_stage("_backbone.norm{s}")),
    (r"^linear_c(\d)$", _seg_stage("decode_head.linear_c{s}.proj")),
    (r"^linear_fuse\.conv$", "decode_head.linear_fuse.seq.conv"),
    (r"^linear_fuse\.bn$", "decode_head.linear_fuse.seq.bn"),
    (r"^linear_pred$", "decode_head.linear_pred"),
)


def segformer_key_mapper():
    return SEGFORMER_RULES


# STDC/BiSeNet segmentation: context path under `cp`, backbone ModuleDict stages
# `block_s{ratio}` (stdc.py:160-236), every ConvBNReLU nests under `seq`,
# stride-2 STDC blocks wrap conv_list[1] in Sequential(dw, conv) (stdc.py:81-87)
STDC_RULES: Rules = (
    (r"^backbone\.block_s(\d+)_0\.conv_list_1_dw\.(conv|bn)$", r"cp.backbone.stages.block§s\1.0.conv_list.1.0.seq.\2"),
    (r"^backbone\.block_s(\d+)_0\.conv_list_1\.(conv|bn)$", r"cp.backbone.stages.block§s\1.0.conv_list.1.1.seq.\2"),
    (r"^backbone\.block_s(\d+)_(\d+)\.conv_list_(\d+)\.(conv|bn)$", r"cp.backbone.stages.block§s\1.\2.conv_list.\3.seq.\4"),
    (r"^backbone\.block_s(\d+)_(\d+)\.(conv|bn)$", r"cp.backbone.stages.block§s\1.\2.seq.\3"),
    (r"^(arm\d+)\.conv_first\.(conv|bn)$", r"cp.\1.conv_first.seq.\2"),
    (r"^(arm\d+)\.attention_conv\.(conv|bn)$", r"cp.\1.attention_block.1.seq.\2"),
    (r"^upsample(\d+)_conv\.(conv|bn)$", r"cp.upsample\1.1.seq.\2"),
    (r"^context_embedding\.(conv|bn)$", r"cp.context_embedding.context_embedding.1.seq.\1"),
    (r"^ffm\.pw_conv\.(conv|bn)$", r"ffm.pw_conv.seq.\1"),
    (r"^ffm\.attention_conv1$", "ffm.attention_block.1.seq.conv"),
    (r"^ffm\.attention_conv2$", "ffm.attention_block.2"),
    (r"^(segmentation_head|aux_head_s16|aux_head_s32|detail_head8)\.conv\.(conv|bn)$", r"\1.0.seg_head.0.seq.\2"),
    (r"^(segmentation_head|aux_head_s16|aux_head_s32|detail_head8)\.pred$", r"\1.0.seg_head.2"),
)


def stdc_key_mapper():
    return STDC_RULES


# PP-LiteSeg: STDC backbone + SPPM context under `encoder`, UAFM decoder under
# `decoder.up_stages` (ppliteseg.py:72-240, context_modules.py:19-62)
PPLITESEG_RULES: Rules = (
    (r"^backbone\.block_s(\d+)_0\.conv_list_1_dw\.(conv|bn)$", r"encoder.backbone.stages.block§s\1.0.conv_list.1.0.seq.\2"),
    (r"^backbone\.block_s(\d+)_0\.conv_list_1\.(conv|bn)$", r"encoder.backbone.stages.block§s\1.0.conv_list.1.1.seq.\2"),
    (r"^backbone\.block_s(\d+)_(\d+)\.conv_list_(\d+)\.(conv|bn)$", r"encoder.backbone.stages.block§s\1.\2.conv_list.\3.seq.\4"),
    (r"^backbone\.block_s(\d+)_(\d+)\.(conv|bn)$", r"encoder.backbone.stages.block§s\1.\2.seq.\3"),
    (r"^context\.branch_(\d+)\.(conv|bn)$", r"encoder.context_module.branches.\1.1.seq.\2"),
    (r"^context\.conv_out\.(conv|bn)$", r"encoder.context_module.conv_out.seq.\1"),
    (r"^proj_(\d+)\.(conv|bn)$", r"encoder.proj_convs.\1.seq.\2"),
    (r"^up_stage_(\d+)\.conv_atten_(\d)\.(conv|bn)$", r"decoder.up_stages.\1.conv_atten.\2.seq.\3"),
    (r"^up_stage_(\d+)\.proj_skip\.(conv|bn)$", r"decoder.up_stages.\1.proj_skip.seq.\2"),
    (r"^up_stage_(\d+)\.conv_out\.(conv|bn)$", r"decoder.up_stages.\1.conv_out.seq.\2"),
    (r"^seg_head\.conv\.(conv|bn)$", r"seg_head.0.seg_head.0.seq.\1"),
    (r"^seg_head\.pred$", "seg_head.0.seg_head.2"),
    (r"^aux_head_(\d+)\.conv\.(conv|bn)$", r"aux_heads.\1.0.seg_head.0.seq.\2"),
    (r"^aux_head_(\d+)\.pred$", r"aux_heads.\1.0.seg_head.2"),
)


def ppliteseg_key_mapper():
    return PPLITESEG_RULES


# BEiT fine-tune architecture (beit.py:167-441): blocks.{i}.attn with q/v-only
# bias + rel-pos table, LayerScale gammas, mlp.fc1/fc2, mean-pool + fc_norm head
BEIT_RULES: Rules = (
    (r"^patch_embed$", "patch_embed.proj"),
    (r"^block_(\d+)\.fc(\d)$", r"blocks.\1.mlp.fc\2"),
    (r"^block_(\d+)", r"blocks.\1"),
)


def beit_key_mapper():
    return BEIT_RULES


def _regseg_block_prefix():
    """RegSeg's backbone Sequential names embed the block geometry
    (regseg.py:236 ``f"{str(d_block)}#{i}"`` with __str__ :165-169) — reconstruct
    them from the stage table so (stage, block) maps to the dynamic torch name."""
    from super_gradients_tpu.models.segmentation.regseg import REGSEG48_STAGES

    names = {}
    cin = 32  # stem output
    for si, stage in enumerate(REGSEG48_STAGES):
        for bi, (oc, dil, gw, stride, se) in enumerate(stage):
            dyn = f"DBlock_in{cin}_out{oc}_d{list(dil)}_gw{gw}_s{stride}_se{se}"
            names[(si, bi)] = f"backbone.stages.{si}.{dyn}#{bi}"
            cin = oc

    def repl(m):
        return names[(int(m.group(1)), int(m.group(2)))]

    return repl


REGSEG_RULES: Rules = (
    (r"^stage(\d+)_(\d+)", _regseg_block_prefix()),
    # DBlock children → d_block_path Sequential indices (regseg.py:151-159)
    (r"\.conv1\.(conv|bn)$", r".d_block_path.0.seq.\1"),
    (r"\.dconv$", ".d_block_path.1"),
    (r"\.dconv_(\d+)$", r".d_block_path.1.convs.\1"),
    (r"\.bn2$", ".d_block_path.2"),
    (r"\.se_fc1$", ".d_block_path.4.se_block.1"),
    (r"\.se_fc2$", ".d_block_path.4.se_block.3"),
    (r"\.conv3\.(conv|bn)$", r".d_block_path.5.seq.\1"),
    (r"\.shortcut\.(conv|bn)$", r".shortcut.shortcut.1.seq.\1"),
    (r"^stem\.(conv|bn)$", r"stem.seq.\1"),
    (r"^proj(\d)\.(conv|bn)$", r"decoder.projections.\1.seq.\2"),
    (r"^decoder_conv\.(conv|bn)$", r"decoder.conv_bn_relu.seq.\1"),
    (r"^head_conv\.(conv|bn)$", r"head.head.0.seq.\1"),
    (r"^head_pred$", "head.head.1"),
)


def regseg_key_mapper():
    return REGSEG_RULES


# ShuffleNetV2: conv1/conv5 Sequentials, layer2-4 stages, branch1/branch2
# Sequential indices (shufflenetv2.py:24-162)
SHUFFLENET_RULES: Rules = (
    (r"^stem\.conv$", "conv1.0"),
    (r"^stem\.bn$", "conv1.1"),
    (r"^stage_(\d+)_(\d+)", lambda m: f"layer{int(m.group(1)) + 2}.{m.group(2)}"),
    (r"\.b_conv1\.conv$", ".branch2.0"),
    (r"\.b_conv1\.bn$", ".branch2.1"),
    (r"\.b_dw\.conv$", ".branch2.3"),
    (r"\.b_dw\.bn$", ".branch2.4"),
    (r"\.b_conv2\.conv$", ".branch2.5"),
    (r"\.b_conv2\.bn$", ".branch2.6"),
    (r"\.l_dw\.conv$", ".branch1.0"),
    (r"\.l_dw\.bn$", ".branch1.1"),
    (r"\.l_conv\.conv$", ".branch1.2"),
    (r"\.l_conv\.bn$", ".branch1.3"),
    (r"^head_conv\.conv$", "conv5.0"),
    (r"^head_conv\.bn$", "conv5.1"),
)


def shufflenet_key_mapper():
    return SHUFFLENET_RULES


# SENet18 (senet.py:45-112): flat stem conv1/bn1, PreAct blocks with BN-less
# Sequential shortcut, SE fc convs
SENET_RULES: Rules = (
    (r"^conv1\.conv$", "conv1"),
    (r"^conv1\.bn$", "bn1"),
    (r"shortcut_conv", "shortcut.0"),
)


def senet_key_mapper():
    return SENET_RULES


# PreActResNet (preact_resnet.py:15-38): Sequential shortcut
PREACT_RULES: Rules = (
    (r"\.shortcut$", ".shortcut.0"),
)


def preact_key_mapper():
    return PREACT_RULES


# ResNeXt (resnext.py:26-130): torchvision layout — flat conv/bn names per block,
# downsample Sequential
RESNEXT_RULES: Rules = (
    (r"^stem\.conv$", "conv1"),
    (r"^stem\.bn$", "bn1"),
    (r"\.conv1\.conv$", ".conv1"),
    (r"\.conv1\.bn$", ".bn1"),
    (r"\.conv2\.conv$", ".conv2"),
    (r"\.conv2\.bn$", ".bn2"),
    (r"\.conv3\.conv$", ".conv3"),
    (r"\.conv3\.bn$", ".bn3"),
    (r"\.shortcut\.conv$", ".downsample.0"),
    (r"\.shortcut\.bn$", ".downsample.1"),
)


def resnext_key_mapper():
    return RESNEXT_RULES


# DPN (dpn.py:15-70): same flat conv/bn layout but the projection is named
# `shortcut` (Sequential), and the stem is conv1/bn1
DPN_RULES: Rules = (
    (r"^stem\.conv$", "conv1"),
    (r"^stem\.bn$", "bn1"),
    (r"\.conv1\.conv$", ".conv1"),
    (r"\.conv1\.bn$", ".bn1"),
    (r"\.conv2\.conv$", ".conv2"),
    (r"\.conv2\.bn$", ".bn2"),
    (r"\.conv3\.conv$", ".conv3"),
    (r"\.conv3\.bn$", ".bn3"),
    (r"\.shortcut\.conv$", ".shortcut.0"),
    (r"\.shortcut\.bn$", ".shortcut.1"),
)


def dpn_key_mapper():
    return DPN_RULES


# DEKR HRNet (dekr_hrnet.py:298-533): transition ModuleLists (nested Sequentials
# for new branches), stage Sequentials of HighResolutionModules with
# branches/fuse_layers grids, ModuleList heads
DEKR_RULES: Rules = (
    (r"^layer1_(\d)\.shortcut_conv$", r"layer1.\1.downsample.0"),
    (r"^layer1_(\d)\.shortcut_bn$", r"layer1.\1.downsample.1"),
    (r"^transition(\d)_(\d)_(\d)_conv$", r"transition\1.\2.\3.0"),
    (r"^transition(\d)_(\d)_(\d)_bn$", r"transition\1.\2.\3.1"),
    (r"^transition(\d)_(\d)_conv$", r"transition\1.\2.0"),
    (r"^transition(\d)_(\d)_bn$", r"transition\1.\2.1"),
    (r"^stage(\d)_m(\d)_branch(\d)_blk(\d)", r"stage\1.\2.branches.\3.\4"),
    (r"^stage(\d)_m(\d)_fuse(\d)_(\d)_(\d)_bn$", r"stage\1.\2.fuse_layers.\3.\4.\5.1"),
    (r"^stage(\d)_m(\d)_fuse(\d)_(\d)_(\d)$", r"stage\1.\2.fuse_layers.\3.\4.\5.0"),
    (r"^stage(\d)_m(\d)_fuse(\d)_(\d)_bn$", r"stage\1.\2.fuse_layers.\3.\4.1"),
    (r"^stage(\d)_m(\d)_fuse(\d)_(\d)$", r"stage\1.\2.fuse_layers.\3.\4.0"),
    (r"^transition_heatmap_conv$", "transition_heatmap.0"),
    (r"^transition_heatmap_bn$", "transition_heatmap.1"),
    (r"^head_heatmap_blk(\d)", r"head_heatmap.0.\1"),
    (r"^heatmap_pred$", "head_heatmap.1"),
    (r"^transition_offset_conv$", "transition_offset.0"),
    (r"^transition_offset_bn$", "transition_offset.1"),
    (r"^offset_feat(\d+)_blk(\d)", r"offset_feature_layers.\1.\2"),
    (r"^offset_pred(\d+)$", r"offset_final_layer.\1"),
)


def dekr_key_mapper():
    return DEKR_RULES


def vgg_key_mapper(cfg):
    """VGG features are one flat Sequential: 3 entries (Conv,BN,ReLU) per conv, 1
    per 'M' pool, trailing AvgPool (vgg.py:26-36). Map our conv_{i} to the flat
    indices computed from the layer cfg."""
    idxs = {}
    ci = flat = 0
    for v in cfg:
        if v == "M":
            flat += 1
        else:
            idxs[ci] = flat
            ci += 1
            flat += 3

    def repl(m):
        base = idxs[int(m.group(1))]
        return f"features.{base if m.group(2) == 'conv' else base + 1}"

    def mapper():
        return ((r"^conv_(\d+)\.(conv|bn)$", repl),)

    return mapper


def load_torch_weights(
    model,
    checkpoint_path: str,
    rules: Optional[Rules] = None,
    strict: bool = True,
    prefer_ema: bool = True,
    only_subtree: Optional[str] = None,
):
    """Load a reference ``.pth`` checkpoint file into an SgModel.

    ``only_subtree="backbone"`` grafts just that top-level module subtree
    (ref ``checkpoint_params.load_backbone``, model_factory.py:192-256) and leaves
    everything else at its initialized values.
    """
    import torch

    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and ("net" in ckpt or "ema_net" in ckpt):
        sd = ckpt.get("ema_net") if (prefer_ema and ckpt.get("ema_net")) else ckpt["net"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    if rules is None:
        mapper = getattr(model, "torch_key_mapper", None)
        rules = mapper() if callable(mapper) else ()
    variables = convert_state_dict(sd, model.variables, rules=rules,
                                   strict=False if only_subtree else strict)
    if only_subtree:
        from super_gradients_tpu.training.checkpoints import resolve_subtree_key

        key = resolve_subtree_key(model.variables.get("params", {}), only_subtree)
        if key is None:
            raise KeyError(
                f"only_subtree='{only_subtree}' matches no top-level module in the model param tree "
                f"(top-level modules: {sorted(model.variables.get('params', {}))}) — nothing would be loaded"
            )
        merged = {}
        for col, tree in model.variables.items():
            merged[col] = dict(tree)
            if key in variables.get(col, {}):
                merged[col][key] = variables[col][key]
        variables = merged
    model.update_variables(variables)
    return model
