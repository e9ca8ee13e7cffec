"""Model stats (XLA cost analysis) + ProfilerCallback tests (SURVEY §5 tracing)."""

import glob
import os

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.model_stats import count_params, format_model_stats, get_model_stats


def test_get_model_stats_resnet_cifar():
    from super_gradients_tpu.models.classification.resnet import CifarResNet

    m = CifarResNet(num_blocks=(1, 1, 1, 1), num_classes=10, block="basic")
    variables = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    stats = get_model_stats(m, variables, input_hw=(32, 32))
    assert stats["params"]["total"] > 1e5
    assert stats["params"]["params"] > 0 and stats["params"]["batch_stats"] > 0
    if stats["flops"]:  # backend-dependent
        assert stats["flops_per_image"] > 1e7  # conv net on 32x32 is >10 MFLOP
    text = format_model_stats(stats)
    assert "params:" in text


def test_count_params_matches_manual():
    import numpy as np

    variables = {"params": {"a": np.zeros((3, 4)), "b": {"c": np.zeros(5)}}}
    assert count_params(variables) == {"params": 17, "total": 17}


def test_profiler_callback_writes_trace(tmp_path):
    from super_gradients_tpu.training.callbacks import PhaseContext, ProfilerCallback

    logdir = str(tmp_path / "prof")
    cb = ProfilerCallback(logdir=logdir, profile_epoch=1, start_step=1, num_steps=2)
    ctx = PhaseContext()
    ctx.epoch = 1
    cb.on_train_loader_start(ctx)
    for _ in range(5):
        jnp.square(jnp.arange(8.0)).block_until_ready()
        cb.on_train_batch_end(ctx)
    cb.on_train_loader_end(ctx)
    traces = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True) + glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    assert traces, f"no trace files written under {logdir}"
