"""bf16 mixed-precision training policy.

TPU-native replacement for the reference's AMP machinery (ref
``sg_trainer.py:503`` autocast forward, ``:1765`` GradScaler step,
``params.py:25`` ``mixed_precision`` flag): on TPU there is no GradScaler —
bf16 has fp32's exponent range, so gradients cannot underflow the way fp16
ones do. The policy is purely a dtype placement:

- **params / optimizer state / EMA / BN running stats: fp32** (master copy).
- **forward + backward compute: bf16** — params and inputs are cast to bf16
  inside the jitted step, so every conv/matmul hits the MXU at its native
  width. The cast is differentiable (``convert_element_type`` transposes to a
  cast back), so gradients arrive fp32 without any extra plumbing.
- **loss / reductions: fp32** — model outputs are upcast before the criterion
  so assigner/IoU/DFL-softmax math (detection losses) keeps full precision.
- flax ``BatchNorm`` internally upcasts its mean/var computation to fp32 and
  re-casts the normalized output to the activation dtype, so batch statistics
  are exact under this policy with zero extra code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_tree(tree, dtype, from_dtype=None):
    """Cast every floating leaf of ``tree`` to ``dtype``.

    Only fp32<->bf16 flips: integer leaves (step counters, label buffers) and
    non-array leaves pass through untouched. ``from_dtype`` restricts which
    source dtype is converted (default: any float)."""

    def _cast(x):
        if not hasattr(x, "dtype"):
            return x
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        if from_dtype is not None and x.dtype != from_dtype:
            return x
        return x.astype(dtype)

    return jax.tree_util.tree_map(_cast, tree)


def to_bf16(tree):
    """fp32 leaves -> bf16 (fp16/fp64 leaves are deliberately left alone)."""
    return cast_tree(tree, jnp.bfloat16, from_dtype=jnp.float32)


def to_f32(tree):
    """bf16 leaves -> fp32."""
    return cast_tree(tree, jnp.float32, from_dtype=jnp.bfloat16)
