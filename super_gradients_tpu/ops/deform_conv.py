"""Deformable convolution v2 (pure-XLA bilinear-gather formulation).

Reference dependency: DEKR uses ``torchvision.ops.DeformConv2d`` (CUDA) at
``pose_estimation_models/dekr_hrnet.py:138`` — SURVEY §2.9 lists it as a native
surface to re-implement. Formulation here: for each of the k*k kernel taps, build
the offset sampling grid, bilinear-sample the input with vectorized corner gathers
(flattened-index ``take``), then contract taps x channels with one einsum (MXU).
No scatter, static shapes, fully differentiable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]; y/x: [N] float coords. Returns [N, C]; zeros outside."""
    h, w, c = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = img.reshape(h * w, c)
        vals = jnp.take(flat, yc * w + xc, axis=0)
        return vals * inside[:, None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    return (
        v00 * ((1 - wy) * (1 - wx))[:, None]
        + v01 * ((1 - wy) * wx)[:, None]
        + v10 * (wy * (1 - wx))[:, None]
        + v11 * (wy * wx)[:, None]
    )


def deform_conv2d(
    x: jnp.ndarray,  # [B, H, W, Cin]
    offsets: jnp.ndarray,  # [B, H, W, 2*k*k]  (dy, dx per tap, torchvision order)
    kernel: jnp.ndarray,  # [k, k, Cin, Cout]
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,  # [B, H, W, k*k] modulation (DCNv2)
    padding: Optional[int] = None,
) -> jnp.ndarray:
    """Stride-1 modulated deformable conv (torchvision DeformConv2d semantics)."""
    b, h, w, cin = x.shape
    k = kernel.shape[0]
    pad = padding if padding is not None else k // 2

    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    base_y = gy.reshape(-1)
    base_x = gx.reshape(-1)

    offs = offsets.reshape(b, h * w, k * k, 2)
    masks = mask.reshape(b, h * w, k * k) if mask is not None else None

    def per_image(img, off, m):
        samples = []
        t = 0
        for ky in range(k):
            for kx in range(k):
                y = base_y + (ky - pad) + off[:, t, 0]
                xx = base_x + (kx - pad) + off[:, t, 1]
                s = _bilinear_sample(img, y, xx)  # [HW, Cin]
                if m is not None:
                    s = s * m[:, t][:, None]
                samples.append(s)
                t += 1
        stacked = jnp.stack(samples, axis=1)  # [HW, k*k, Cin]
        out = jnp.einsum("ptc,tco->po", stacked, kernel.reshape(k * k, cin, -1))
        return out.reshape(h, w, -1)

    if masks is None:
        out = jax.vmap(lambda img, off: per_image(img, off, None))(x, offs)
    else:
        out = jax.vmap(per_image)(x, offs, masks)
    if bias is not None:
        out = out + bias
    return out
