"""TPU-fast stride-1 max pooling for SPP blocks.

The reference's SPP (``yolo_nas/panneck.py`` / ``yolo_x``/``pp_yolo_e`` necks)
runs three stride-1 max pools with kernels (5, 9, 13). Two TPU problems with
the naive lowering:

1. XLA lowers the max-pool *backward* to ``select-and-scatter``, which is
   near-sequential on TPU — profiled at ~42 ms of a 616 ms YOLO-NAS-M b96
   train step (7%) for pools operating on a mere [96, 20, 20, 384] tensor.
2. A 13x13 stride-1 window is 169 taps of forward work.

Both are avoided exactly:

- **SPPF chaining** (YOLOv5's trick, exact for stride-1 SAME max pooling with
  -inf padding): ``pool9(x) == pool5(pool5(x))`` and
  ``pool13(x) == pool5(pool5(pool5(x)))`` — max over a Minkowski sum of
  windows equals composed maxes. :func:`chained_max_pools` computes the
  (5, 9, 13) pyramid as three 5x5 pools.
- **Vectorized backward**: :func:`max_pool_same_s1` carries a custom VJP that
  computes the gradient with k*k shifted compare/accumulate passes (all
  elementwise, fully fusable) instead of select-and-scatter. Tie routing
  matches XLA/torch exactly: each output's gradient goes to the FIRST window
  position (row-major) attaining the max.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _reduce_max_window(x: jnp.ndarray, ks: int) -> jnp.ndarray:
    p = ks // 2
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, init, lax.max, (1, ks, ks, 1), (1, 1, 1, 1), ((0, 0), (p, p), (p, p), (0, 0))
    )


def _shift2d(x: jnp.ndarray, dr: int, dc: int, fill) -> jnp.ndarray:
    """out[r, c] = x[r + dr, c + dc] (NHWC rows/cols), out-of-range -> fill."""
    padded = jnp.pad(
        x,
        ((0, 0), (max(-dr, 0), max(dr, 0)), (max(-dc, 0), max(dc, 0)), (0, 0)),
        constant_values=fill,
    )
    r0 = max(dr, 0)
    c0 = max(dc, 0)
    return lax.dynamic_slice(padded, (0, r0, c0, 0), x.shape)


def _bwd(ks: int, res, g):
    x, y = res
    p = ks // 2
    neg = jnp.asarray(-jnp.inf, x.dtype)
    zero = jnp.zeros((), g.dtype)
    grad_in = jnp.zeros_like(g)
    claimed = jnp.zeros(x.shape, dtype=bool)
    # Window position (di, dj) of output j reads input i = j + (di - p, dj - p).
    # Iterate positions in row-major order, claiming each output's gradient for
    # the first position whose input equals the max (select-and-scatter order).
    for di in range(ks):
        for dj in range(ks):
            x_at = _shift2d(x, di - p, dj - p, neg)  # x seen from the output grid
            hit = x_at == y
            routed = jnp.where(hit & ~claimed, g, zero)
            claimed = claimed | hit
            grad_in = grad_in + _shift2d(routed, p - di, p - dj, zero)  # back to input grid
    return (grad_in,)


def _fwd(x: jnp.ndarray, ks: int):
    y = _reduce_max_window(x, ks)
    return y, (x, y)


max_pool_same_s1 = jax.custom_vjp(_reduce_max_window, nondiff_argnums=(1,))
max_pool_same_s1.defvjp(_fwd, _bwd)
max_pool_same_s1.__doc__ = (
    "Stride-1 SAME max pool (NHWC), identical to nn.max_pool(x, (ks, ks), "
    "strides=(1, 1), padding=((p, p), (p, p))) with p = ks // 2, with a "
    "TPU-fast vectorized backward (no select-and-scatter)."
)


def chained_max_pools(x: jnp.ndarray, ks: Sequence[int]) -> Tuple[jnp.ndarray, ...]:
    """The SPP pyramid ``[max_pool_k(x) for k in ks]`` computed with chained
    small pools where the kernel ladder allows (exact — see module docstring),
    each pool using the fast custom-VJP backward.

    For the canonical (5, 9, 13): three 5x5 pools, each feeding the next.
    A kernel that doesn't extend the chain (or an even kernel) pools directly
    from ``x``.
    """
    outs = []
    prev = x
    reach = 0  # accumulated one-sided radius of `prev` relative to x
    for k in ks:
        radius = k // 2
        step = radius - reach
        if k % 2 == 1 and step > 0:
            prev = max_pool_same_s1(prev, 2 * step + 1)
            reach = radius
            outs.append(prev)
        else:
            outs.append(max_pool_same_s1(x, int(k)))
    return tuple(outs)
