"""Reusable conv blocks (flax.linen, NHWC).

TPU-native re-design of the reference's ``modules/`` package
(``conv_bn_act_block.py``, ``qarepvgg_block.py:10-330``, ``repvgg_block.py:8-230``,
``se_blocks.py``). Key differences from the torch originals:

- NHWC layout (XLA:TPU's preferred conv layout); weights convert from torch OIHW.
- Explicit symmetric padding ``k//2`` to match torch's ``autopad`` semantics exactly
  (XLA "SAME" pads asymmetrically for even sizes — would break checkpoint parity).
- Re-parameterization (RepVGG/QARepVGG fuse) is a *pure function on the param pytree*
  (:func:`fuse_qarepvgg_params`), not module surgery: the fused module is the same
  class with ``fused=True`` and the fused params are computed functionally.
- BatchNorm momentum convention: flax ``momentum`` = 1 - torch momentum.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

ModuleDef = Any

ACTIVATIONS: dict = {
    "relu": nn.relu,
    "relu6": lambda x: jnp.minimum(nn.relu(x), 6.0),
    "silu": nn.silu,
    "swish": nn.silu,
    "lrelu": lambda x: nn.leaky_relu(x, 0.1),
    "leaky_relu": lambda x: nn.leaky_relu(x, 0.1),
    # torch nn.LeakyReLU() default slope (darknet53.py:15 create_conv_module)
    "leaky_relu_01": lambda x: nn.leaky_relu(x, 0.01),
    "hardswish": nn.hard_swish,
    "hardsigmoid": nn.hard_sigmoid,
    "sigmoid": nn.sigmoid,
    "gelu": nn.gelu,
    "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
    "identity": lambda x: x,
    None: lambda x: x,
}


def get_activation(name) -> Callable:
    if callable(name):
        return name
    if name not in ACTIVATIONS:
        raise KeyError(f"Unknown activation `{name}`; known: {sorted(k for k in ACTIVATIONS if k)}")
    return ACTIVATIONS[name]


def autopad(kernel: int, padding: Optional[int] = None) -> int:
    """torch-style same-ish padding: k//2 (reference ``modules/utils.py`` autopad)."""
    return padding if padding is not None else kernel // 2


def width_multiplier(original: int, factor: float, divisor: Optional[int] = None) -> int:
    """Channel scaling helper (reference ``modules/utils.py`` width_multiplier)."""
    if divisor is None:
        return int(original * factor)
    return math.ceil(int(original * factor) / divisor) * divisor


class ConvBNAct(nn.Module):
    """Conv2d → BatchNorm → activation (reference ``Conv``/``ConvBNAct``/``ConvBNReLU``).

    ``padding=None`` → torch autopad (k//2, symmetric). BN follows the enclosing
    model's (eps, momentum) settings passed explicitly.
    """

    out_channels: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    padding: Any = None  # int | None (torch autopad) | "same" (TF/XLA SAME)
    act: Any = "relu"
    use_bn: bool = True
    bias: bool = False
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1  # torch convention; flax uses 1 - this

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.padding == "same":
            # TF/XLA SAME (asymmetric for even overhang) — torch Conv2dSamePadding
            # analogue used by EfficientNet (ref efficientnet.py:104-163)
            pad = "SAME"
        else:
            p = autopad(self.kernel, self.padding)
            pad = ((p, p), (p, p))
        x = nn.Conv(
            self.out_channels,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.bias,
            name="conv",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=self.bn_eps,
                name="bn",
            )(x)
        return get_activation(self.act)(x)


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference ``modules/se_blocks.py``)."""

    squeeze_channels: int
    act: Any = "relu"
    gate: Any = "sigmoid"

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), use_bias=True, name="fc1")(s)
        s = get_activation(self.act)(s)
        s = nn.Conv(c, (1, 1), use_bias=True, name="fc2")(s)
        return x * get_activation(self.gate)(s)


class ConvTranspose2x2(nn.Module):
    """Exact analogue of ``nn.ConvTranspose2d(in, out, kernel_size=2, stride=2)``.

    Implemented as einsum + reshape (non-overlapping stride==kernel case), which is
    both bit-exact vs torch and MXU-friendly. Weight layout: [2, 2, in, out]
    (torch ``[in, out, 2, 2]`` transposes to this in the converter).
    """

    out_channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (2, 2, c, self.out_channels))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        # y[b, 2i+p, 2j+q, o] = sum_c x[b,i,j,c] * K[p,q,c,o]
        y = jnp.einsum("bhwc,pqco->bhpwqo", x, kernel)
        y = y.reshape(b, h * 2, w * 2, self.out_channels)
        return y + bias


class _RawConvParams(nn.Module):
    """Holds an ``nn.Conv``-compatible kernel (+bias) param without the conv op.

    Name this module like the conv it replaces and the param paths (and hence
    checkpoint layout AND init RNG streams) are identical to ``nn.Conv``'s —
    used by the s2d stem fast path, which consumes the kernel through a layout
    transform instead of calling the conv directly.
    """

    shape: Tuple[int, ...]
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        b = self.param("bias", nn.initializers.zeros_init(), (self.shape[-1],)) if self.use_bias else None
        return k, b


def _s2d_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """Space-to-depth(2x2), channel index (p*2+q)*C+c (matches yolo_nas
    s2d_stem_params / YoloNASBackbone.stem_s2d ordering)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _s2d_kernel_from_3x3(w: jnp.ndarray) -> jnp.ndarray:
    """Differentiable [3,3,C,O] -> [2,2,4C,O] scatter: the stride-2 pad-1 3x3
    conv as a stride-1 2x2 conv on the s2d(2x2) tensor (the deploy-side
    ``s2d_stem_params`` math, kept in-graph so gradients flow to the original
    kernel layout). W2[v,u,(p*2+q)*C+c,o] = W[2v+p-1, 2u+q-1, c, o]."""
    C, O = w.shape[2], w.shape[3]
    w2 = jnp.zeros((2, 2, 4 * C, O), w.dtype)
    for v in range(2):
        for u in range(2):
            for p in range(2):
                for q in range(2):
                    di, dj = 2 * v + p - 1, 2 * u + q - 1
                    if 0 <= di <= 2 and 0 <= dj <= 2:
                        w2 = w2.at[v, u, (p * 2 + q) * C : (p * 2 + q + 1) * C, :].set(w[di, dj])
    return w2


class QARepVGGBlock(nn.Module):
    """QARepVGG S4 block (reference ``modules/qarepvgg_block.py:10-330``).

    Branches: 3x3 conv + BN  ||  1x1 conv (+bias, *alpha)  ||  identity;
    sum → post-BN → act → SE. When ``fused=True`` the module holds a single
    ``rbr_reparam`` 3x3 conv + bias (partial fusion keeps ``post_bn``; full fusion
    folds it — both produced functionally by :func:`fuse_qarepvgg_params`).
    """

    out_channels: int
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: Any = "relu"
    use_residual: bool = True
    use_alpha: bool = False
    use_1x1_bias: bool = True
    use_post_bn: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    se_ratio: Optional[float] = None  # None = no SE
    fused: str = "none"  # none | partial | full

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.dilation
        act_fn = get_activation(self.act)

        if self.fused != "none":
            y = nn.Conv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=True,
                name="rbr_reparam",
            )(x)
            if self.fused == "partial" and self.use_post_bn:
                y = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=1.0 - self.bn_momentum,
                    epsilon=self.bn_eps,
                    name="post_bn",
                )(y)
            out = act_fn(y)
        else:
            cin = x.shape[-1]
            # Tiny-Cin stride-2 stems (the 3-channel image stem): computing
            # both branches as ONE packed 2x2 conv on the s2d(2x2) input is
            # exact (deploy's s2d_stem_params math, differentiable, same
            # params) and wins at inference — but in the TRAIN step it LOSES:
            # A/B on v5e (YOLO-NAS-M b64, chained-params, 2 reps each) gave
            # 446 ms/step packed vs 425 ms/step two-branch (~5% regression;
            # the s2d reshuffle's backward transpose outweighs the MXU-lane
            # win once the backward pass dominates). Default OFF for
            # training; opt in with SG_TPU_S2D_STEM=1. Inference keeps the
            # s2d form via the deploy-fusion path (yolo_nas.s2d_stem_params).
            import os

            s2d_fast = (
                self.stride == 2 and self.groups == 1 and self.dilation == 1
                and not self.use_residual and cin * 9 <= 64
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
                and os.environ.get("SG_TPU_S2D_STEM", "0") == "1"
            )
            if s2d_fast:
                w3, _ = _RawConvParams((3, 3, cin, self.out_channels), use_bias=False, name="branch_3x3_conv")()
                w1, b1 = _RawConvParams((1, 1, cin, self.out_channels), use_bias=self.use_1x1_bias, name="branch_1x1")()
                # 1x1 stride-2 pad-0 == 3x3 stride-2 pad-1 with only the center tap
                w1_as_3x3 = jnp.zeros((3, 3, cin, self.out_channels), w1.dtype).at[1, 1].set(w1[0, 0])
                packed = _s2d_kernel_from_3x3(jnp.concatenate([w3, w1_as_3x3], axis=-1))
                xs = _s2d_2x2(x)
                y = jax.lax.conv_general_dilated(
                    xs, packed, (1, 1), ((1, 0), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
                y3, y1 = y[..., : self.out_channels], y[..., self.out_channels :]
                if b1 is not None:
                    y1 = y1 + b1
            else:
                y3 = nn.Conv(
                    self.out_channels,
                    (3, 3),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False,
                    name="branch_3x3_conv",
                )(x)
                y1 = nn.Conv(
                    self.out_channels,
                    (1, 1),
                    strides=(self.stride, self.stride),
                    feature_group_count=self.groups,
                    use_bias=self.use_1x1_bias,
                    name="branch_1x1",
                )(x)
            y3 = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - self.bn_momentum,
                epsilon=self.bn_eps,
                name="branch_3x3_bn",
            )(y3)
            if self.use_alpha:
                alpha = self.param("alpha", nn.initializers.ones, (1,))
                y1 = alpha * y1
            y = y3 + y1
            if self.use_residual:
                y = y + x
            if self.use_post_bn:
                y = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=1.0 - self.bn_momentum,
                    epsilon=self.bn_eps,
                    name="post_bn",
                )(y)
            out = act_fn(y)

        if self.se_ratio:
            out = SEBlock(max(1, int(self.out_channels * self.se_ratio)), name="se")(out)
        return out


class RepVGGBlock(nn.Module):
    """Classic RepVGG block (reference ``modules/repvgg_block.py:8-230``):
    3x3 conv+BN || 1x1 conv+BN || identity-BN, sum → act → SE. Each branch has its
    own BN (3 BNs); fuses to a single 3x3 conv via :func:`fuse_repvgg_params`.
    """

    out_channels: int
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    act: Any = "relu"
    use_residual: bool = True
    se_ratio: Optional[float] = None
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    fused: str = "none"  # none | full

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.dilation
        act_fn = get_activation(self.act)
        if self.fused != "none":
            y = nn.Conv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=True,
                name="rbr_reparam",
            )(x)
            out = act_fn(y)
        else:
            bn_kw = dict(use_running_average=not train, momentum=1.0 - self.bn_momentum, epsilon=self.bn_eps)
            y3 = nn.Conv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                feature_group_count=self.groups,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=False,
                name="branch_3x3_conv",
            )(x)
            y3 = nn.BatchNorm(name="branch_3x3_bn", **bn_kw)(y3)
            y1 = nn.Conv(
                self.out_channels,
                (1, 1),
                strides=(self.stride, self.stride),
                feature_group_count=self.groups,
                use_bias=False,
                name="branch_1x1_conv",
            )(x)
            y1 = nn.BatchNorm(name="branch_1x1_bn", **bn_kw)(y1)
            y = y3 + y1
            if self.use_residual:
                y = y + nn.BatchNorm(name="identity_bn", **bn_kw)(x)
            out = act_fn(y)
        if self.se_ratio:
            out = SEBlock(max(1, int(self.out_channels * self.se_ratio)), name="se")(out)
        return out


# ------------------------------------------------------------------ fusion math
# Pure pytree→pytree transforms implementing the reference's reparameterization
# (qarepvgg_block.py:207-300, repvgg_block.py:163-217) in NHWC/HWIO layout.


def _fuse_bn(kernel: jnp.ndarray, bias, mean, var, gamma, beta, eps) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold BN into a conv kernel [kh, kw, in, out] + bias [out]."""
    std = jnp.sqrt(var + eps)
    a = gamma / std
    fused_kernel = kernel * a[None, None, None, :]
    fused_bias = (bias if bias is not None else 0.0) * a + beta - gamma * mean / std
    return fused_kernel, fused_bias


def _pad_1x1_to_3x3(kernel1x1: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(kernel1x1, ((1, 1), (1, 1), (0, 0), (0, 0)))


def _identity_kernel_3x3(channels: int, groups: int, dtype) -> jnp.ndarray:
    in_dim = channels // groups
    k = jnp.zeros((3, 3, in_dim, channels), dtype=dtype)
    idx_out = jnp.arange(channels)
    return k.at[1, 1, idx_out % in_dim, idx_out].set(1.0)


def fuse_qarepvgg_params(block_params: dict, block_stats: dict, cfg: QARepVGGBlock) -> Tuple[dict, dict, dict]:
    """Compute (partial-)fused params for one QARepVGG block.

    Returns (fused_params, fused_batch_stats_partial, fully_fused_params):
    - partial fusion: branches → single conv, ``post_bn`` retained (trainable);
    - full fusion: post_bn folded in as well (deploy).
    Mirrors reference ``partial_fusion``/``full_fusion`` (qarepvgg_block.py:255-320).
    """
    k3 = block_params["branch_3x3_conv"]["kernel"]
    bn3 = block_params["branch_3x3_bn"]
    st3 = block_stats["branch_3x3_bn"]
    kernel3, bias3 = _fuse_bn(k3, None, st3["mean"], st3["var"], bn3["scale"], bn3["bias"], cfg.bn_eps)

    k1 = _pad_1x1_to_3x3(block_params["branch_1x1"]["kernel"])
    b1 = block_params["branch_1x1"].get("bias", jnp.zeros(cfg.out_channels, k1.dtype))
    alpha = block_params.get("alpha", jnp.ones((1,), k1.dtype))[0] if cfg.use_alpha else 1.0

    eq_kernel = kernel3 + alpha * k1
    eq_bias = bias3 + alpha * b1
    if cfg.use_residual:
        eq_kernel = eq_kernel + _identity_kernel_3x3(cfg.out_channels, cfg.groups, eq_kernel.dtype)

    partial_params = {"rbr_reparam": {"kernel": eq_kernel, "bias": eq_bias}}
    partial_stats = {}
    if cfg.use_post_bn:
        partial_params["post_bn"] = dict(block_params["post_bn"])
        partial_stats["post_bn"] = dict(block_stats["post_bn"])
        pbn = block_params["post_bn"]
        pst = block_stats["post_bn"]
        full_kernel, full_bias = _fuse_bn(eq_kernel, eq_bias, pst["mean"], pst["var"], pbn["scale"], pbn["bias"], cfg.bn_eps)
    else:
        full_kernel, full_bias = eq_kernel, eq_bias
    full_params = {"rbr_reparam": {"kernel": full_kernel, "bias": full_bias}}
    return partial_params, partial_stats, full_params


def fuse_repvgg_params(block_params: dict, block_stats: dict, cfg: RepVGGBlock) -> dict:
    """Fully fuse a RepVGG block's three branches into one 3x3 conv (deploy)."""
    k3, b3 = _fuse_bn(
        block_params["branch_3x3_conv"]["kernel"],
        None,
        block_stats["branch_3x3_bn"]["mean"],
        block_stats["branch_3x3_bn"]["var"],
        block_params["branch_3x3_bn"]["scale"],
        block_params["branch_3x3_bn"]["bias"],
        cfg.bn_eps,
    )
    k1, b1 = _fuse_bn(
        _pad_1x1_to_3x3(block_params["branch_1x1_conv"]["kernel"]),
        None,
        block_stats["branch_1x1_bn"]["mean"],
        block_stats["branch_1x1_bn"]["var"],
        block_params["branch_1x1_bn"]["scale"],
        block_params["branch_1x1_bn"]["bias"],
        cfg.bn_eps,
    )
    kernel, bias = k3 + k1, b3 + b1
    if cfg.use_residual:
        kid, bid = _fuse_bn(
            _identity_kernel_3x3(cfg.out_channels, cfg.groups, k3.dtype),
            None,
            block_stats["identity_bn"]["mean"],
            block_stats["identity_bn"]["var"],
            block_params["identity_bn"]["scale"],
            block_params["identity_bn"]["bias"],
            cfg.bn_eps,
        )
        kernel, bias = kernel + kid, bias + bid
    return {"rbr_reparam": {"kernel": kernel, "bias": bias}}


def fuse_all_qarepvgg(params: dict, batch_stats: dict, bn_eps: float) -> Tuple[dict, dict]:
    """Walk a variables tree and fully fuse every QARepVGG block found.

    A QARepVGG block subtree is recognized by its ``branch_3x3_conv`` key. Block
    config is inferred from the params themselves: ``use_residual`` iff
    in_channels == out_channels (holds for every YOLO-NAS placement — residual
    blocks are exactly the channel-preserving stride-1 ones), ``use_alpha`` iff an
    ``alpha`` leaf exists, ``use_post_bn`` iff ``post_bn`` exists. Returns
    (fused_params, fused_batch_stats) where fused blocks collapse to
    ``rbr_reparam`` and their BN stats are consumed (deploy form — the analogue of
    reference ``fuse_repvgg_blocks_residual_branches`` / QARepVGG ``full_fusion``).
    """

    def walk(p: dict, s: dict) -> Tuple[dict, dict]:
        if "branch_3x3_conv" in p and "branch_1x1_conv" in p:
            # classic RepVGG block (per-branch BNs — e.g. PPYoloE CSPResNet):
            # residual iff the identity-BN branch exists; groups inferred from the
            # grouped-conv kernel layout [3,3,in/groups,out] with in==out on
            # residual placements
            k = p["branch_3x3_conv"]["kernel"]
            out_ch = int(k.shape[3])
            groups = max(1, out_ch // int(k.shape[2])) if "identity_bn" in p else 1
            cfg = RepVGGBlock(
                out_channels=out_ch,
                use_residual="identity_bn" in p,
                groups=groups,
                bn_eps=bn_eps,
            )
            return fuse_repvgg_params(p, s, cfg), {}
        if "branch_3x3_conv" in p:
            k = p["branch_3x3_conv"]["kernel"]
            cfg = QARepVGGBlock(
                out_channels=int(k.shape[3]),
                use_residual=int(k.shape[2]) == int(k.shape[3]),
                use_alpha="alpha" in p,
                use_post_bn="post_bn" in p,
                bn_eps=bn_eps,
            )
            _, _, full = fuse_qarepvgg_params(p, s, cfg)
            return full, {}
        new_p, new_s = {}, {}
        for key, val in p.items():
            if isinstance(val, dict):
                sub_s = s.get(key, {}) if isinstance(s, dict) else {}
                fp, fs = walk(val, sub_s)
                new_p[key] = fp
                if fs:
                    new_s[key] = fs
            else:
                new_p[key] = val
        # keep BN stats of non-QARepVGG modules untouched
        if isinstance(s, dict):
            for key, val in s.items():
                if key not in new_s and key not in p:
                    new_s[key] = val
                elif key in p and isinstance(p[key], dict) and "branch_3x3_conv" not in p[key]:
                    if key not in new_s:
                        new_s[key] = val
        return new_p, new_s

    return walk(params, batch_stats)
