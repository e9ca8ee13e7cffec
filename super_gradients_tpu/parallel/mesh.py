"""Device mesh setup — the TPU-native replacement for the reference's DDP machinery.

The reference spawns one process per GPU (``distributed_training_utils.py:174-353``:
``setup_device`` → ``restart_script_with_ddp`` → NCCL process group). On TPU, one
controller process per host addresses all local chips through a
``jax.sharding.Mesh``; gradients reduce over ICI inside the jitted step (``lax.pmean``
under ``shard_map`` or implicitly via sharded-jit), and multi-host bootstrap is
``jax.distributed.initialize()`` over DCN. There is no subprocess relaunch and no
separate "DP vs DDP" mode: ``jit`` over a mesh subsumes both.

Mesh axis convention (used across the framework):
- ``batch``  — data parallelism (ICI all-reduce of grads)
- ``model``  — optional tensor/spatial parallelism for very large models/images
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)

BATCH_AXIS = "batch"
MODEL_AXIS = "model"


@dataclasses.dataclass
class DeviceConfig:
    """Process-global device state (reference ``common/environment/device_utils.py``)."""

    mesh: Optional[Mesh] = None
    num_devices: int = 1
    multi_host: bool = False

    @property
    def is_distributed(self) -> bool:
        return self.num_devices > 1

    @property
    def is_primary(self) -> bool:
        return jax.process_index() == 0


device_config = DeviceConfig()


def setup_device(
    num_devices: Optional[int] = None,
    mesh_shape: Optional[Tuple[int, int]] = None,
    multi_host: bool = False,
) -> Mesh:
    """Build the global device mesh. Reference parity: ``setup_device``
    (``distributed_training_utils.py:174``), re-imagined as mesh construction.

    Args:
        num_devices: devices to use for the ``batch`` axis (default: all).
        mesh_shape: explicit ``(batch, model)`` axis sizes; overrides num_devices.
        multi_host: call ``jax.distributed.initialize()`` first (TPU pod slices).
    """
    if multi_host and jax.process_count() == 1:
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized / single host
            logger.debug(f"jax.distributed.initialize skipped: {e}")

    devices = jax.devices()
    if mesh_shape is None:
        n = num_devices or len(devices)
        mesh_shape = (n, 1)
    total = mesh_shape[0] * mesh_shape[1]
    if total > len(devices):
        raise ValueError(f"Requested mesh {mesh_shape} needs {total} devices; only {len(devices)} available")
    dev_array = np.asarray(devices[:total]).reshape(mesh_shape)
    mesh = Mesh(dev_array, (BATCH_AXIS, MODEL_AXIS))

    device_config.mesh = mesh
    device_config.num_devices = total
    device_config.multi_host = jax.process_count() > 1
    logger.info(f"Device mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} on {devices[0].platform}")
    return mesh


def get_mesh() -> Mesh:
    if device_config.mesh is None:
        setup_device()
    return device_config.mesh


def batch_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    """Sharding for a [B, ...] batch: split dim 0 over the ``batch`` axis."""
    return NamedSharding(mesh or get_mesh(), P(BATCH_AXIS))


def replicated_sharding(mesh: Optional[Mesh] = None) -> NamedSharding:
    return NamedSharding(mesh or get_mesh(), P())


def shard_batch(batch, mesh: Optional[Mesh] = None):
    """Place a host-local batch pytree onto the mesh, batch-dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Optional[Mesh] = None):
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_slice(global_batch_size: int) -> slice:
    """Per-host slice of the global batch (multi-host input pipeline sharding)."""
    per_host = global_batch_size // jax.process_count()
    start = per_host * jax.process_index()
    return slice(start, start + per_host)
