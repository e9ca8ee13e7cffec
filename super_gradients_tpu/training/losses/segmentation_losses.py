"""Segmentation losses.

Reference: ``training/losses/`` — DiceLoss/BCE-Dice (dice_loss.py), OhemCELoss
(ohem_ce_loss.py:102), STDC detail loss (stdc_loss.py, laplacian boundary targets +
BCE+Dice on the detail head), DiceCEEdgeLoss (DDRNet). All are jit-pure and
mask-based (ignore_index pixels contribute zero weight) — no boolean indexing.

Targets: [B, H, W] int32 class ids; ``ignore_index`` (default 255) marks void.
Model outputs: [B, H, W, C] logits, or tuples (main, *aux) in training mode.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.registry import register_loss


def _valid_mask(targets: jnp.ndarray, ignore_index: int) -> jnp.ndarray:
    return (targets != ignore_index).astype(jnp.float32)


def pixel_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int = 255) -> jnp.ndarray:
    """Per-pixel CE with ignore mask: [B, H, W]."""
    num_classes = logits.shape[-1]
    safe_t = jnp.where(targets == ignore_index, 0, targets)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, safe_t[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return ce * _valid_mask(targets, ignore_index)


@register_loss("SegCrossEntropyLoss")
class SegCrossEntropyLoss:
    def __init__(self, ignore_index: int = 255):
        self.ignore_index = ignore_index

    def __call__(self, outputs, targets) -> Tuple[jnp.ndarray, Dict]:
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        ce = pixel_cross_entropy(logits, targets, self.ignore_index)
        n = jnp.maximum(_valid_mask(targets, self.ignore_index).sum(), 1.0)
        loss = ce.sum() / n
        return loss, {"SegCrossEntropyLoss": loss}


@register_loss("OhemCELoss")
class OhemCELoss:
    """Online hard-example-mining CE (ref ohem_ce_loss.py:102).

    Keeps the hardest pixels: those with loss above ``threshold``-derived value,
    but at least ``mining_percent`` of all valid pixels.
    """

    def __init__(self, threshold: float = 0.7, mining_percent: float = 0.1, ignore_lb: int = 255):
        if not 0 <= mining_percent <= 1:
            raise ValueError(f"mining percent must be in [0, 1], got {mining_percent}")
        self.thresh = -jnp.log(jnp.asarray(threshold))
        self.mining_percent = mining_percent
        self.ignore_lb = ignore_lb

    def __call__(self, outputs, targets) -> Tuple[jnp.ndarray, Dict]:
        # BATCH-GLOBAL mining over all valid pixels (ref ohem_ce_loss.py:38-61):
        # sort descending; if the num_mining-th loss exceeds thresh keep every
        # pixel above thresh, else keep exactly the top num_mining; mean of kept.
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        ce = pixel_cross_entropy(logits, targets, self.ignore_lb).reshape(-1)
        valid = _valid_mask(targets, self.ignore_lb).reshape(-1)
        n_valid = valid.sum().astype(jnp.int32)
        num_mining = jnp.minimum((self.mining_percent * n_valid).astype(jnp.int32), n_valid - 1)
        num_mining = jnp.maximum(num_mining, 0)
        sorted_ce = jnp.sort(ce * valid)[::-1]  # invalid pixels contribute 0 at the tail
        pivot = jnp.take(sorted_ce, num_mining)
        idx = jnp.arange(sorted_ce.shape[0])
        # thresh = -log(p) > 0 for p < 1, so `> thresh` also excludes the zero tail
        keep = jnp.where(pivot > self.thresh, sorted_ce > self.thresh, idx < num_mining)
        keep = keep & (idx < n_valid)
        loss = (sorted_ce * keep).sum() / jnp.maximum(keep.sum(), 1)
        loss = jnp.where(n_valid == 0, 0.0, loss)
        return loss, {"OhemCELoss": loss}


def soft_dice(logits: jnp.ndarray, targets: jnp.ndarray, ignore_index: int = 255, eps: float = 1e-5) -> jnp.ndarray:
    """Soft dice loss over classes (binary per-class formulation)."""
    num_classes = logits.shape[-1]
    valid = _valid_mask(targets, ignore_index)[..., None]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * valid
    onehot = jax.nn.one_hot(jnp.where(targets == ignore_index, 0, targets), num_classes) * valid
    inter = jnp.sum(probs * onehot, axis=(1, 2))
    denom = jnp.sum(probs, axis=(1, 2)) + jnp.sum(onehot, axis=(1, 2))
    dice = (2 * inter + eps) / (denom + eps)
    return 1.0 - dice.mean()


@register_loss("DiceLoss")
class DiceLoss:
    def __init__(self, ignore_index: int = 255):
        self.ignore_index = ignore_index

    def __call__(self, outputs, targets):
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        loss = soft_dice(logits, targets, self.ignore_index)
        return loss, {"DiceLoss": loss}


@register_loss("BinaryDiceLoss")
class BinaryDiceLoss:
    def __call__(self, logits, targets_binary):
        p = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]
        inter = jnp.sum(p * targets_binary, axis=(1, 2))
        denom = jnp.sum(p, axis=(1, 2)) + jnp.sum(targets_binary, axis=(1, 2))
        loss = 1.0 - ((2 * inter + 1.0) / (denom + 1.0)).mean()
        return loss, {"BinaryDiceLoss": loss}


def detail_target(targets: jnp.ndarray, ignore_index: int = 255) -> jnp.ndarray:
    """Boundary (detail) ground truth via multi-scale laplacian of the seg mask
    (ref stdc_loss.py detail-aggregate module: laplacian at strides 1/2/4 fused
    with weights [0.6, 0.3, 0.1], binarized at 0.1)."""
    t = jnp.where(targets == ignore_index, 0, targets).astype(jnp.float32)[..., None]  # [B,H,W,1]
    lap = jnp.asarray([[-1.0, -1, -1], [-1, 8, -1], [-1, -1, -1]]).reshape(3, 3, 1, 1)

    def edge(x, stride):
        y = jax.lax.conv_general_dilated(
            x, lap, window_strides=(stride, stride), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jnp.clip(jnp.abs(y), 0, 1.0)
        if stride > 1:
            b, h, w, c = x.shape
            y = jax.image.resize(y, (b, h, w, c), method="nearest")
        return (y > 0.1).astype(jnp.float32)

    fused = 0.6 * edge(t, 1) + 0.3 * edge(t, 2) + 0.1 * edge(t, 4)
    return (fused > 0.1).astype(jnp.float32)[..., 0]  # [B, H, W]


@register_loss("STDCLoss")
class STDCLoss:
    """Composite STDC training loss (ref stdc_loss.py): OHEM-CE on main + aux heads,
    BCE + dice on the detail head vs laplacian boundary targets."""

    def __init__(
        self,
        num_classes: int = 19,
        ignore_index: int = 255,
        threshold: float = 0.7,
        mining_percent: float = 0.1,
        weights: Sequence[float] = (1.0, 1.0, 1.0),  # main, aux32, aux16
        detail_weights: Sequence[float] = (1.0, 1.0),  # bce, dice
    ):
        self.ignore_index = ignore_index
        self.ohem = OhemCELoss(threshold, mining_percent, ignore_index)
        self.weights = tuple(weights)
        self.detail_weights = tuple(detail_weights)

    def __call__(self, outputs, targets):
        if not isinstance(outputs, (tuple, list)):
            loss, _ = self.ohem(outputs, targets)
            return loss, {"STDCLoss/main": loss}
        main, aux32, aux16, detail8 = outputs
        l_main, _ = self.ohem(main, targets)
        l_a32, _ = self.ohem(aux32, targets)
        l_a16, _ = self.ohem(aux16, targets)

        dt = detail_target(targets, self.ignore_index)
        dlogit = detail8[..., 0]
        bce = jnp.maximum(dlogit, 0) - dlogit * dt + jnp.log1p(jnp.exp(-jnp.abs(dlogit)))
        l_bce = bce.mean()
        l_dice, _ = BinaryDiceLoss()(detail8, dt)

        loss = (
            self.weights[0] * l_main
            + self.weights[1] * l_a32
            + self.weights[2] * l_a16
            + self.detail_weights[0] * l_bce
            + self.detail_weights[1] * l_dice
        )
        return loss, {"loss_main": l_main, "loss_aux": l_a32 + l_a16, "loss_detail": l_bce + l_dice}


@register_loss("DiceCEEdgeLoss")
class DiceCEEdgeLoss:
    """DDRNet/general aux loss: CE+dice on main, CE on aux heads (ref dice_ce_edge_loss.py)."""

    def __init__(self, num_classes: int = 19, ignore_index: int = 255, num_aux_heads: int = 1,
                 ce_edge_weights: Sequence[float] = (0.5, 0.5), weights: Sequence[float] = (1.0,),
                 aux_weights: Sequence[float] = (0.4,)):
        self.ignore_index = ignore_index
        self.aux_weights = tuple(aux_weights)
        self.ce = SegCrossEntropyLoss(ignore_index)

    def __call__(self, outputs, targets):
        if not isinstance(outputs, (tuple, list)):
            outputs = (outputs,)
        main = outputs[0]
        l_main_ce, _ = self.ce(main, targets)
        l_dice = soft_dice(main, targets, self.ignore_index)
        loss = l_main_ce + l_dice
        aux_total = 0.0
        for i, aux in enumerate(outputs[1:]):
            w = self.aux_weights[i] if i < len(self.aux_weights) else self.aux_weights[-1]
            l_aux, _ = self.ce(aux, targets)
            aux_total = aux_total + w * l_aux
        loss = loss + aux_total
        return loss, {"loss_ce": l_main_ce, "loss_dice": l_dice}


@register_loss("BCEDiceLoss")
class BCEDiceLoss:
    """Weighted BCE + Dice on binary segmentation logits (ref bce_dice_loss.py):
    ``loss = w0 * BCEWithLogits + w1 * BinaryDice``."""

    def __init__(self, loss_weights: Sequence[float] = (0.5, 0.5), logits: bool = True):
        self.loss_weights = tuple(loss_weights)

    def __call__(self, outputs, targets) -> Tuple[jnp.ndarray, Dict]:
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        t = targets.astype(jnp.float32)
        z = logits[..., 0] if logits.ndim == t.ndim + 1 else logits
        bce = (jnp.maximum(z, 0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))).mean()
        dice, _ = BinaryDiceLoss()(z[..., None] if z.ndim == t.ndim else logits, t)
        loss = self.loss_weights[0] * bce + self.loss_weights[1] * dice
        return loss, {"bce": bce, "dice": dice}


@register_loss("ShelfNetOHEMLoss")
class ShelfNetOHEMLoss(OhemCELoss):
    """OHEM-CE summed over all ShelfNet output heads (ref shelfnet_ohem_loss.py:9-29)."""

    def __init__(self, threshold: float = 0.7, mining_percent: float = 1e-4, ignore_lb: int = 255):
        super().__init__(threshold=threshold, mining_percent=mining_percent, ignore_lb=ignore_lb)

    def __call__(self, outputs, targets) -> Tuple[jnp.ndarray, Dict]:
        outputs = outputs if isinstance(outputs, (tuple, list)) else (outputs,)
        losses = [super(ShelfNetOHEMLoss, self).__call__(o, targets)[0] for o in outputs]
        total = sum(losses)
        return total, {f"ohem_{i}": l for i, l in enumerate(losses)}


@register_loss("ShelfNetSemanticEncodingLoss")
class ShelfNetSemanticEncodingLoss:
    """CE on two seg heads + BCE on the semantic-encoding (global class presence)
    head (ref shelfnet_semantic_encoding_loss.py:10-39). Outputs are
    ``(pred1 [B,H,W,C], se_pred [B,C], pred2 [B,H,W,C])``; the SE target is the
    per-image class-presence indicator derived from the labels."""

    def __init__(self, se_weight: float = 0.2, nclass: int = 21, aux_weight: float = 0.4,
                 ignore_index: int = -1):
        self.se_weight, self.nclass, self.aux_weight = se_weight, nclass, aux_weight
        self.ignore_index = ignore_index

    def __call__(self, outputs, targets) -> Tuple[jnp.ndarray, Dict]:
        pred1, se_pred, pred2 = outputs
        ce = SegCrossEntropyLoss(self.ignore_index)
        loss1, _ = ce(pred1, targets)
        loss2, _ = ce(pred2, targets)
        # class-presence indicator per image: 1 if any pixel carries the class
        onehot = jax.nn.one_hot(jnp.clip(targets, 0, self.nclass - 1), self.nclass)
        valid = _valid_mask(targets, self.ignore_index)[..., None]
        se_target = ((onehot * valid).sum(axis=(1, 2)) > 0).astype(jnp.float32)  # [B, C]
        p = jax.nn.sigmoid(se_pred.astype(jnp.float32))
        loss3 = -(se_target * jnp.log(p + 1e-12) + (1 - se_target) * jnp.log(1 - p + 1e-12)).mean()
        total = loss1 + self.aux_weight * loss2 + self.se_weight * loss3
        return total, {"ce_main": loss1, "ce_aux": loss2, "se_bce": loss3}


@register_loss("MaskAttentionLoss")
class MaskAttentionLoss:
    """Pixel mask-attention wrapper (ref losses/mask_loss.py:7-56): total =
    ``w0 * reduce(per_pixel_loss) + w1 * reduce(per_pixel_loss over mask==1)``.

    ``criterion`` must return an UNREDUCED per-pixel loss map (e.g.
    :func:`pixel_cross_entropy`). The mask is broadcast over channels only; when no
    foreground pixels exist the mask term is 0 (matches the reference numel()==0
    branch — here a masked mean with a clamped denominator).
    """

    def __init__(self, criterion=None, loss_weights: Sequence[float] = (1.0, 1.0), ignore_index: int = 255):
        if len(loss_weights) != 2:
            raise ValueError(f"loss_weights must have 2 values, found {len(loss_weights)}")
        if loss_weights[1] <= 0:
            raise ValueError("mask loss weight must be positive; use the bare criterion otherwise")
        self.criterion = criterion or (lambda logits, t: pixel_cross_entropy(logits, t, ignore_index))
        self.loss_weights = tuple(loss_weights)
        self.ignore_index = ignore_index

    def __call__(self, outputs, targets, mask=None) -> Tuple[jnp.ndarray, Dict]:
        logits = outputs[0] if isinstance(outputs, (tuple, list)) else outputs
        if mask is None:  # allow (targets, mask) packed as a tuple
            targets, mask = targets
        per_pixel = self.criterion(logits, targets)  # [B, H, W]
        if mask.ndim == per_pixel.ndim + 1:  # [B, H, W, 1] -> [B, H, W]
            mask = mask[..., 0]
        mask = mask.astype(jnp.float32)
        valid = _valid_mask(targets, self.ignore_index)
        base = per_pixel.sum() / jnp.maximum(valid.sum(), 1.0)
        fg = mask * valid
        mask_term = (per_pixel * fg).sum() / jnp.maximum(fg.sum(), 1.0)
        loss = self.loss_weights[0] * base + self.loss_weights[1] * mask_term
        return loss, {"loss_base": base, "loss_mask": mask_term}


@register_loss("CWDKlDivLoss")
@register_loss("SegKDLoss")
class ChannelWiseKnowledgeDistillationLoss:
    """Channel-wise distillation for segmentation (ref losses/cwd_loss.py):
    KL between per-channel spatial softmaxes of student and teacher logits,
    temperature-scaled."""

    def __init__(self, temperature: float = 4.0, normalization_mode: str = "channel_wise"):
        self.temperature = temperature

    def __call__(self, outputs, targets=None) -> Tuple[jnp.ndarray, Dict]:
        # outputs: KDOutput(student_logits [B,H,W,C], teacher_logits [B,H,W,C])
        s, t = outputs.student_output, outputs.teacher_output
        if isinstance(s, (tuple, list)):
            s = s[0]
        if isinstance(t, (tuple, list)):
            t = t[0]
        tau = self.temperature
        b, h, w, c = s.shape
        s_flat = s.reshape(b, h * w, c) / tau
        t_flat = t.reshape(b, h * w, c) / tau
        # softmax over the SPATIAL dim per channel
        s_logp = jax.nn.log_softmax(s_flat, axis=1)
        t_p = jax.nn.softmax(t_flat, axis=1)
        kl = jnp.sum(t_p * (jnp.log(t_p + 1e-12) - s_logp), axis=1)  # [B, C]
        loss = jnp.mean(kl) * (tau**2)
        return loss, {"cwd_loss": loss}
