"""ShelfNet (LW + HW) and LadderNet (flax, NHWC) — reference-faithful.

Reference: ``segmentation_models/shelfnet.py`` (687 LoC). Structure per variant:

- ShelfNet18/34_LW (:639-669): ResNet18/34 trunk, last THREE feature maps
  (strides 8/16/32); ShelfNet18 reduces channels with ``conv_out_list`` 1x1
  ConvBNReLUs (:652), ShelfNet34's channels are already aligned (:588);
  DecoderLW (:217-245, AttentionRefinementModule ups + nearest x2) then
  LadderBlockLW (:352-391, strided-conv down branch + ARM up branch);
  three NetOutput heads (:394-411) upsampled bilinear align_corners=True.
- ShelfNet50/101/50_3343 (HW, :470-558): ResNet-bottleneck trunk, all four maps
  reduced to 64/128/256/512, DecoderHW/LadderBlockHW with ConvTranspose2d
  (k3 s2 p1 outp1) ups, 1x1 ``final`` head + SE-loss ``se_layer`` Linear on the
  max-pooled ladder bottom + FCNHead aux on the stride-16 backbone map.

Key quirk: ShelfBlock (:35-72) applies its ``conv1`` weights TWICE (shared), with
separate bn1/bn2, and ``DecoderBase.inconv`` exists in the state_dict but DecoderLW/
HW never call it (:180-214) — so it has no flax counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from super_gradients_tpu.models.classification.resnet import BasicResNetBlock, BottleneckBlock
from super_gradients_tpu.models.segmentation.stdc import _upsample
from super_gradients_tpu.modules.blocks import ConvBNAct


def _bn(name, train):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)


class ShelfBlock(nn.Module):
    """S-Block (ref shelfnet.py:35-72): conv1→bn1→relu→dropout→conv1(SHARED)→bn2,
    residual, relu. ``conv0`` (+relu) first when in_planes != planes."""

    planes: int
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.planes:
            x = nn.relu(nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), name="conv0")(x))
        conv1 = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)), name="conv1")
        y = nn.relu(_bn("bn1", train)(conv1(x)))
        # ref nn.Dropout2d: whole-channel dropout
        y = nn.Dropout(self.dropout, broadcast_dims=(1, 2), deterministic=not train)(y)
        y = _bn("bn2", train)(conv1(y))
        return nn.relu(y + x)


class AttentionRefinementModule(nn.Module):
    """ref shelfnet.py:248-265: ConvBNReLU then global-pool channel attention."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        feat = ConvBNAct(out_channels=self.out_channels, kernel=3, act="relu", name="conv")(x, train=train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)  # F.avg_pool2d(full)
        atten = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="conv_atten")(atten)
        atten = _bn("bn_atten", train)(atten)
        return feat * jax.nn.sigmoid(atten)


class ConvTranspose3x3s2(nn.Module):
    """nn.ConvTranspose2d(k=3, s=2, p=1, output_padding=1) — doubles H/W.

    Computed as a zero-dilated conv with the spatially-flipped kernel; param
    layout [3,3,in,out] (torch [in,out,3,3] transposes in the converter)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        k = self.param("kernel", nn.initializers.lecun_normal(), (3, 3, cin, self.out_channels))
        b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(k, (0, 1)), window_strides=(1, 1), padding=((1, 2), (1, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class _ResNetFeatures(nn.Module):
    """ShelfResNetBackBone (ref shelfnet.py:75-116): ResNet trunk returning the
    four stage maps (strides 4/8/16/32)."""

    widths: Tuple[int, ...] = (64, 128, 256, 512)
    blocks: Tuple[int, ...] = (2, 2, 2, 2)
    block: str = "basic"  # basic | bottleneck (ShelfNet50/101)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=64, kernel=7, stride=2, act="relu", name="conv1")(x, train=train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        blk = BasicResNetBlock if self.block == "basic" else BottleneckBlock
        feats = []
        for li, (w, n) in enumerate(zip(self.widths, self.blocks)):
            for bi in range(n):
                x = blk(w, stride=2 if (bi == 0 and li > 0) else 1, name=f"layer{li + 1}_{bi}")(x, train=train)
            feats.append(x)
        return feats


class NetOutput(nn.Module):
    """ref shelfnet.py:394-411: ConvBNReLU + 3x3 pred conv (bias=False)."""

    mid_channels: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(out_channels=self.mid_channels, kernel=3, act="relu", name="conv")(x, train=train)
        return nn.Conv(self.num_classes, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="conv_out")(x)


class DecoderLW(nn.Module):
    """ref shelfnet.py:217-245 (bottom S-block, then ARM → nearest x2 → +skip →
    ConvBNReLU per level; DecoderBase.inconv is never called)."""

    planes: int
    layers: int = 3

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        out = ShelfBlock(self.planes * 2 ** (self.layers - 1), name="bottom")(feats[-1], train=train)
        ups = [out]
        for j in range(self.layers - 1):
            w = self.planes * 2 ** max(0, self.layers - j - 2)
            out = AttentionRefinementModule(w, name=f"up_conv_list_{j}")(out, train=train)
            b, h, ww, cc = out.shape
            out = jax.image.resize(out, (b, h * 2, ww * 2, cc), "nearest")
            out = out + feats[self.layers - j - 2]
            out = ConvBNAct(out_channels=w, kernel=3, act="relu", name=f"up_dense_list_{j}")(out, train=train)
            ups.append(out)
        return ups


class LadderBlockLW(nn.Module):
    """ref shelfnet.py:352-391: inconv S-block, strided-conv down branch (+decoder
    skips), bottom S-block, ARM up branch (+down skips)."""

    planes: int
    layers: int = 3

    @nn.compact
    def __call__(self, x: Sequence[jnp.ndarray], train: bool = False):
        out = ShelfBlock(self.planes, name="inconv")(x[-1], train=train)
        down_out = []
        for i in range(self.layers - 1):
            out = out + x[-i - 1]
            out = ShelfBlock(self.planes * 2**i, name=f"down_module_list_{i}")(out, train=train)
            down_out.append(out)
            out = nn.Conv(self.planes * 2 ** (i + 1), (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), name=f"down_conv_list_{i}")(out)
            out = nn.relu(out)
        out = ShelfBlock(self.planes * 2 ** (self.layers - 1), name="bottom")(out, train=train)
        ups = [out]
        for j in range(self.layers - 1):
            w = self.planes * 2 ** max(0, self.layers - j - 2)
            out = AttentionRefinementModule(w, name=f"up_conv_list_{j}")(out, train=train)
            b, h, ww, cc = out.shape
            out = jax.image.resize(out, (b, h * 2, ww * 2, cc), "nearest")
            out = out + down_out[self.layers - j - 2]
            out = ConvBNAct(out_channels=w, kernel=3, act="relu", name=f"up_dense_list_{j}")(out, train=train)
            ups.append(out)
        return ups


class DecoderHW(nn.Module):
    """ref shelfnet.py:184-214: bottom S-block then ConvTranspose ups + S-blocks."""

    planes: int
    layers: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        out = ShelfBlock(self.planes * 2 ** (self.layers - 1), name="bottom")(feats[-1], train=train)
        ups = [out]
        for j in range(self.layers - 1):
            w = self.planes * 2 ** max(0, self.layers - j - 2)
            out = ConvTranspose3x3s2(w, name=f"up_conv_list_{j}")(out) + feats[self.layers - j - 2]
            out = ShelfBlock(w, name=f"up_dense_list_{j}")(out, train=train)
            ups.append(out)
        return ups


class LadderBlockHW(nn.Module):
    """ref shelfnet.py:306-349."""

    planes: int
    layers: int = 4

    @nn.compact
    def __call__(self, x: Sequence[jnp.ndarray], train: bool = False):
        out = ShelfBlock(self.planes, name="inconv")(x[-1], train=train)
        down_out = []
        for i in range(self.layers - 1):
            out = out + x[-i - 1]
            out = ShelfBlock(self.planes * 2**i, name=f"down_module_list_{i}")(out, train=train)
            down_out.append(out)
            out = nn.Conv(self.planes * 2 ** (i + 1), (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)), name=f"down_conv_list_{i}")(out)
            out = nn.relu(out)
        out = ShelfBlock(self.planes * 2 ** (self.layers - 1), name="bottom")(out, train=train)
        ups = [out]
        for j in range(self.layers - 1):
            w = self.planes * 2 ** max(0, self.layers - j - 2)
            out = ConvTranspose3x3s2(w, name=f"up_conv_list_{j}")(out) + down_out[self.layers - j - 2]
            out = ShelfBlock(w, name=f"up_dense_list_{j}")(out, train=train)
            ups.append(out)
        return ups


@dataclasses.dataclass(frozen=True)
class ShelfNetCfg:
    num_classes: int = 19
    variant: str = "18_lw"  # 18_lw | 34_lw | 50 | 50_3343 | 101
    # when True the forward returns the aux-head tuple even in eval mode,
    # mirroring the reference's auxilary_head_outputs=True default
    aux_outputs: bool = False

    @property
    def is_lw(self) -> bool:
        return self.variant.endswith("_lw")


_BACKBONES = {
    "18_lw": ("basic", (2, 2, 2, 2)),
    "34_lw": ("basic", (3, 4, 6, 3)),
    "50": ("bottleneck", (3, 4, 6, 3)),
    "50_3343": ("bottleneck", (3, 3, 4, 3)),
    "101": ("bottleneck", (3, 4, 23, 3)),
}


class ShelfNet(nn.Module):
    """ShelfNet assembly (ref shelfnet.py:414-687, all five registered variants)."""

    cfg: ShelfNetCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        h_in, w_in = x.shape[1], x.shape[2]
        block, blocks = _BACKBONES[c.variant]
        feats = _ResNetFeatures(blocks=blocks, block=block, name="backbone")(x, train=train)
        want_aux = train or c.aux_outputs

        if c.is_lw:
            planes = 64 if c.variant == "18_lw" else 128
            fe = feats[1:]
            if c.variant == "18_lw":  # 1x1 channel reducers (ref :652)
                fe = [ConvBNAct(out_channels=planes * 2**i, kernel=1, act="relu",
                                name=f"conv_out_list_{i}")(f, train=train) for i, f in enumerate(fe)]
            dec = DecoderLW(planes, 3, name="decoder")(fe, train=train)
            lad = LadderBlockLW(planes, 3, name="ladder")(dec, train=train)
            feat_cp = lad[::-1]  # [planes@s8, 2p@s16, 4p@s32] (ref :595)
            outs = []
            for i, f in enumerate(feat_cp):
                mid = planes if i == 0 else 64
                y = NetOutput(mid, c.num_classes, name=f"net_output_list_{i}")(f, train=train)
                outs.append(_upsample(y, h_in // y.shape[1], "bilinear_ac"))
            return tuple(outs) if want_aux else outs[0]

        # HW (ref :470-527): 4 levels reduced to 64..512, ConvTranspose shelf
        planes = 64
        fe = [ConvBNAct(out_channels=planes * 2**i, kernel=1, act="relu",
                        name=f"conv_out_list_{i}")(f, train=train) for i, f in enumerate(feats)]
        dec = DecoderHW(planes, 4, name="decoder")(fe, train=train)
        lad = LadderBlockHW(planes, 4, name="ladder")(dec, train=train)
        main = nn.Conv(c.num_classes, (1, 1), name="final")(lad[-1])
        main = _upsample(main, h_in // main.shape[1], "bilinear_ac")
        # SE-loss encoding: full-spatial max-pool of the ladder bottom (ref :510-514)
        enc = jnp.max(lad[0], axis=(1, 2))
        se = nn.Dense(c.num_classes, name="se_layer")(enc)
        # FCNHead aux on the stride-16 backbone map (ref :520-523)
        a = feats[2]
        inter = a.shape[-1] // 4
        a = nn.Conv(inter, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, name="aux_head_fcn_0")(a)
        a = nn.relu(_bn("aux_head_fcn_1", train)(a))
        a = nn.Dropout(0.1, broadcast_dims=(1, 2), deterministic=not train)(a)
        a = nn.Conv(c.num_classes, (1, 1), name="aux_head_fcn_4")(a)
        a = _upsample(a, h_in // a.shape[1], "bilinear_ac")
        return (main, se, a) if want_aux else main


# ---------------------------------------------------------------- LadderNet


@dataclasses.dataclass(frozen=True)
class LadderNetCfg:
    num_classes: int = 19
    widths: Tuple[int, ...] = (64, 128, 256, 512)


class LadderNet(nn.Module):
    """LadderNet-50-3433-style single ladder (ref laddernet.py:326-500)."""

    cfg: LadderNetCfg

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.cfg
        in_h, in_w = x.shape[1], x.shape[2]
        feats = _ResNetFeatures(c.widths, name="backbone")(x, train=train)
        # ladder up-branch: residual up-blocks summing backbone skips
        d = feats[3]
        for i in [2, 1, 0]:
            b, h, w, _ = d.shape
            d = ConvBNAct(out_channels=c.widths[i], kernel=1, act="relu", name=f"up_proj{i}")(d, train=train)
            d = jax.image.resize(d, (b, h * 2, w * 2, c.widths[i]), "bilinear")
            d = nn.relu(d + feats[i])
            d = BasicResNetBlock(c.widths[i], name=f"up_block{i}")(d, train=train)
        y = nn.Conv(c.num_classes, (1, 1), name="final")(d)
        return jax.image.resize(y, (x.shape[0], in_h, in_w, c.num_classes), "bilinear")
