"""Spatial sharding primitives — convolutions over images sharded across chips.

SURVEY §5: the reference's only large-input mechanisms are sliding-window tiling and
multi-scale resize; the TPU-native capability that replaces "sequence parallelism"
for a vision framework is SPATIAL sharding: split H (or W) of a huge image over a
mesh axis with ``shard_map``, exchange k//2-row halos between neighbor devices with
``ppermute`` over ICI, and run convolutions on local shards.

Building blocks:
- :func:`halo_exchange` — pad a local shard with neighbor rows (inside shard_map)
- :func:`sharded_conv` — spatially-correct conv over an H-sharded image
- :func:`spatial_shard_apply` — run any per-tile function over an H-sharded batch
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str, spatial_axis: int = 1) -> jnp.ndarray:
    """Append ``halo`` rows from each neighbor along a sharded spatial axis.

    Call INSIDE shard_map. x: local shard [..., H_local, ...]. Returns the shard
    padded to H_local + 2*halo (edge shards zero-padded on the outside).
    """
    if halo == 0:
        return x
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    def take(a, start, size):
        sl = [slice(None)] * a.ndim
        sl[spatial_axis] = slice(start, start + size) if start >= 0 else slice(start, None)
        return a[tuple(sl)]

    # my bottom rows -> next device's top halo; my top rows -> prev device's bottom halo
    bottom = take(x, -halo, halo)
    top = take(x, 0, halo)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_prev = jax.lax.ppermute(bottom, axis_name, fwd)  # received from idx-1
    from_next = jax.lax.ppermute(top, axis_name, bwd)  # received from idx+1

    # zero the wrap-around halos at the edges
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=spatial_axis)


def sharded_conv(
    images: jnp.ndarray,  # [B, H, W, C] with H sharded over `axis_name`
    kernel: jnp.ndarray,  # [kh, kw, C, O]
    mesh: Mesh,
    axis_name: str = "model",
    stride: int = 1,
) -> jnp.ndarray:
    """Convolution over an H-sharded image with ppermute halo exchange.

    Produces the SAME result as an unsharded SAME-padded conv (for H_local % stride
    == 0). The halo rows ride ICI; compute stays local.
    """
    kh = kernel.shape[0]
    halo = kh // 2

    def local_conv(x, k):
        x = halo_exchange(x, halo, axis_name, spatial_axis=1)
        # after halo exchange: pad W normally, H already extended (edges got zeros
        # which equal SAME padding)
        return jax.lax.conv_general_dilated(
            x, k,
            window_strides=(stride, stride),
            padding=((0, 0), (kernel.shape[1] // 2, kernel.shape[1] // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return shard_map(
        local_conv,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P(None, None, None, None)),
        out_specs=P(None, axis_name, None, None),
    )(images, kernel)


def spatial_shard_apply(fn: Callable, images: jnp.ndarray, mesh: Mesh, axis_name: str = "batch") -> jnp.ndarray:
    """Run ``fn`` on an H-sharded image batch, one shard per device (independent
    tiles — the sliding-window multi-chip mapping)."""
    return shard_map(fn, mesh=mesh, in_specs=P(None, axis_name, None, None), out_specs=P(None, axis_name, None, None))(images)
