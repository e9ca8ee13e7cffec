"""Pallas TPU kernel: blocked greedy (exact) NMS suppression.

The exact-NMS recurrence keep[i] = valid[i] & !any(kept[j] & iou[i,j] > t, j < i) is
inherently sequential; the XLA fallback (``ops.nms._exact_keep_mask``) runs a
K-step ``lax.fori_loop`` of HBM-touching vector ops. This kernel runs the whole
suppression in VMEM with 128-box blocks:

- inter-block: one [128, K_prev] IoU matrix vs already-decided keeps (VPU)
- intra-block: 128-step sequential resolution on a [128, 128] VMEM tile

Mosaic lowering notes: IoU matrices are built from pure 2-D [N,1]x[1,M] broadcasts
(3-D broadcasts and dynamic row gathers don't lower), which is why the kernel takes
boxes in BOTH [K,4] and transposed [4,K] layouts. boxes must be score-desc sorted.
The batch rides the grid. Interprets on CPU (tests), compiles on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128


def _iou_2d(a_cols: jnp.ndarray, b_rows: jnp.ndarray) -> jnp.ndarray:
    """IoU via 2-D broadcasts only. a_cols: [N, 4]; b_rows: [4, M] -> [N, M]."""
    ax1, ay1, ax2, ay2 = a_cols[:, 0:1], a_cols[:, 1:2], a_cols[:, 2:3], a_cols[:, 3:4]
    bx1, by1, bx2, by2 = b_rows[0:1, :], b_rows[1:2, :], b_rows[2:3, :], b_rows[3:4, :]
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    area_a = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)  # [N, 1]
    area_b = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)  # [1, M]
    return inter / (area_a + area_b - inter + 1e-9)


def _nms_kernel(boxes_ref, boxes_t_ref, valid_ref, keep_ref, *, iou_threshold: float, k: int):
    nblocks = k // BLOCK
    boxes = boxes_ref[0]  # [K, 4]
    boxes_t = boxes_t_ref[0]  # [4, K]
    valid = valid_ref[0, 0]  # [K]
    keep_ref[0, 0, :] = jnp.zeros((k,), keep_ref.dtype)

    for bi in range(nblocks):
        blk = boxes[bi * BLOCK : (bi + 1) * BLOCK, :]  # [128, 4]
        alive = valid[bi * BLOCK : (bi + 1) * BLOCK] > 0  # [128]

        if bi > 0:
            prev_t = boxes_t[:, 0 : bi * BLOCK]  # [4, M]
            kept_prev = keep_ref[0, 0, 0 : bi * BLOCK]  # [M] float 0/1
            iou_prev = _iou_2d(blk, prev_t)  # [128, M]
            sup = jnp.max(iou_prev * kept_prev[None, :], axis=1) > iou_threshold
            alive = alive & ~sup

        blk_t = boxes_t[:, bi * BLOCK : (bi + 1) * BLOCK]  # [4, 128]
        over = (_iou_2d(blk, blk_t) > iou_threshold).astype(jnp.float32)  # [128, 128]
        idx = jax.lax.broadcasted_iota(jnp.int32, (BLOCK,), 0)
        alive_f = alive.astype(jnp.float32)

        def body(i, alive_f):
            # row i via one-hot mask (dynamic gathers don't lower in Mosaic);
            # float masks throughout (Mosaic: no bool reductions, and minor-dim
            # insertion is 32-bit-only — hence astype before [:, None])
            onehot_col = (idx == i).astype(jnp.float32)[:, None]  # [128, 1]
            row = jnp.max(over * onehot_col, axis=0)  # [128]
            before_i = (idx < i).astype(jnp.float32)
            suppressed = jnp.max(row * alive_f * before_i) > 0.5
            drop = (idx == i).astype(jnp.float32) * jnp.where(suppressed, 1.0, 0.0)
            return alive_f * (1.0 - drop)

        alive_f = jax.lax.fori_loop(1, BLOCK, body, alive_f)
        alive = alive_f > 0.5
        keep_ref[0, 0, bi * BLOCK : (bi + 1) * BLOCK] = alive.astype(keep_ref.dtype)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_exact_nms_keep(
    boxes: jnp.ndarray,  # [B, K, 4] score-desc sorted, f32
    valid: jnp.ndarray,  # [B, K] bool/int
    iou_threshold: float = 0.7,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns keep mask [B, K] (float32 0/1). K must be a multiple of 128."""
    b, k, _ = boxes.shape
    assert k % BLOCK == 0, f"K must be a multiple of {BLOCK}, got {k}"
    kernel = functools.partial(_nms_kernel, iou_threshold=iou_threshold, k=k)
    # TPU block constraint: last two dims divisible by (8, 128) or equal to the
    # array dims — hence valid/keep ride as [B, 1, K]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes, jnp.swapaxes(boxes, 1, 2), valid.astype(jnp.float32)[:, None, :])
    return out[:, 0, :]
