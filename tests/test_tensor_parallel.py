"""Tensor-parallel param sharding (parallel/tensor.py): the same flax module,
with kernels' output-channel dims sharded over the ``model`` mesh axis, must
produce the unsharded forward's outputs — GSPMD inserts the collectives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax.linen as nn

from super_gradients_tpu.parallel import mesh as mesh_mod
from super_gradients_tpu.parallel.tensor import (
    shard_params_tp,
    tensor_parallel_shardings,
    tp_axis_size,
)


class _WideCNN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (3, 3))(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=2)(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(128)(x)
        x = nn.relu(x)
        return nn.Dense(10)(x)


def _mesh(batch, model):
    devs = np.asarray(jax.devices()[: batch * model]).reshape(batch, model)
    m = Mesh(devs, ("batch", "model"))
    mesh_mod.device_config.mesh = m
    mesh_mod.device_config.num_devices = batch * model
    return m


@pytest.fixture(autouse=True)
def _restore_mesh():
    yield
    mesh_mod.device_config.mesh = None
    mesh_mod.device_config.num_devices = 1


def test_shardings_shard_trailing_dim_only():
    mesh = _mesh(1, 8)
    variables = {
        "params": {
            "conv": {"kernel": jnp.zeros((3, 3, 3, 64)), "bias": jnp.zeros((64,))},
            "tiny": {"kernel": jnp.zeros((3, 3, 16, 16))},  # 16/8 < 8 -> replicated
            "odd": {"kernel": jnp.zeros((3, 3, 8, 36))},  # 36 % 8 != 0 -> replicated
        }
    }
    sh = tensor_parallel_shardings(variables, mesh)
    assert sh["params"]["conv"]["kernel"].spec == P(None, None, None, "model")
    assert sh["params"]["conv"]["bias"].spec == P("model")
    assert sh["params"]["tiny"]["kernel"].spec == P()
    assert sh["params"]["odd"]["kernel"].spec == P()
    assert tp_axis_size(mesh) == 8


@pytest.mark.parametrize("mesh_shape", [(1, 8), (2, 4)], ids=["tp8", "dp2xtp4"])
def test_tp_forward_matches_unsharded(mesh_shape):
    mesh = _mesh(*mesh_shape)
    module = _WideCNN()
    x = jnp.asarray(np.random.RandomState(0).rand(4, 16, 16, 3).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)

    ref = module.apply(variables, x)

    tp_vars = shard_params_tp(variables, mesh)
    # inputs batch-sharded over the dp axis (replicated over tp)
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("batch")))
    out = jax.jit(module.apply)(tp_vars, x_sharded)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
    # the sharding actually took: conv kernels live sliced over the model axis
    kern = tp_vars["params"]["Conv_0"]["kernel"]
    assert kern.sharding.spec == P(None, None, None, "model")


def test_tp_grads_match_unsharded():
    mesh = _mesh(2, 4)
    module = _WideCNN()
    x = jnp.asarray(np.random.RandomState(1).rand(4, 16, 16, 3).astype(np.float32))
    y = jnp.asarray(np.arange(4) % 10)
    variables = module.init(jax.random.PRNGKey(0), x)

    def loss_fn(v, xb, yb):
        logits = module.apply(v, xb)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))

    ref_grads = jax.grad(loss_fn)(variables, x, y)

    tp_vars = shard_params_tp(variables, mesh)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("batch")))
    y_sh = jax.device_put(y, NamedSharding(mesh, P("batch")))
    tp_grads = jax.jit(jax.grad(loss_fn))(tp_vars, x_sh, y_sh)

    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_tp = jax.tree_util.tree_leaves(tp_grads)
    for r, t in zip(flat_ref, flat_tp):
        np.testing.assert_allclose(np.asarray(t), np.asarray(r), rtol=5e-5, atol=5e-5)
