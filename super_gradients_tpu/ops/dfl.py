"""Distribution-Focal-Loss (DFL) box regression decode.

Reference parity: the integral-projection decode in ``yolo_nas/dfl_heads.py:199-245``
and ``pp_yolo_head.py`` — head emits a discrete distribution over ``reg_max+1`` bins
per box side; the expected value (softmax ⋅ arange) is the predicted distance.

The projection is expressed as a matmul so XLA places it on the MXU and fuses the
softmax in.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def dfl_decode(dist_logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """[..., 4, reg_max+1] logits → [..., 4] expected distances (in stride units)."""
    proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
    prob = jax.nn.softmax(dist_logits.astype(jnp.float32), axis=-1)
    return jnp.einsum("...k,k->...", prob, proj)


def dfl_targets(distances: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Soft two-hot DFL training targets: [..., 4] continuous → [..., 4, reg_max+1].

    target = (ceil - d) on floor bin and (d - floor) on ceil bin (linear interpolation),
    as in the reference's ``_df_loss`` target construction.
    """
    d = jnp.clip(distances, 0, reg_max - 1e-4)
    lo = jnp.floor(d)
    hi = lo + 1
    w_hi = d - lo
    w_lo = 1.0 - w_hi
    lo_oh = jax.nn.one_hot(lo.astype(jnp.int32), reg_max + 1)
    hi_oh = jax.nn.one_hot(hi.astype(jnp.int32), reg_max + 1)
    return lo_oh * w_lo[..., None] + hi_oh * w_hi[..., None]
