"""bf16 mixed-precision training policy (ref sg_trainer.py:503 autocast,
:1765 GradScaler, params.py:25 mixed_precision) + the silent-drop config guard.

The TPU policy (training/mixed_precision.py): fp32 master params/opt/EMA/BN
buffers, bf16 forward+backward compute, fp32 loss/reductions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import super_gradients_tpu as sg
from super_gradients_tpu.training.mixed_precision import to_bf16, to_f32


def _tree_dtypes(tree):
    return {jnp.asarray(l).dtype for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "dtype")}


def test_cast_helpers_roundtrip():
    tree = {"w": jnp.ones((4, 4), jnp.float32), "step": jnp.zeros((), jnp.int32), "h": jnp.ones((2,), jnp.float16)}
    b = to_bf16(tree)
    assert b["w"].dtype == jnp.bfloat16
    assert b["step"].dtype == jnp.int32  # ints untouched
    assert b["h"].dtype == jnp.float16  # only fp32 flips
    f = to_f32(b)
    assert f["w"].dtype == jnp.float32


def test_bf16_forward_matches_fp32():
    """Casting params+inputs to bf16 keeps conv/BN activations bf16 end-to-end
    and stays numerically close to the fp32 forward."""
    model = sg.models.get("resnet18", num_classes=10)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    out32 = model.module.apply(model.variables, x, train=False)
    outbf = model.module.apply(to_bf16(model.variables), x.astype(jnp.bfloat16), train=False)
    assert outbf.dtype == jnp.bfloat16  # compute really ran in bf16
    np.testing.assert_allclose(
        np.asarray(out32), np.asarray(outbf, dtype=np.float32), atol=0.15, rtol=0.1
    )


def test_detection_loss_stable_under_bf16_forward():
    """PPYoloELoss on a bf16-forward output (upcast to fp32, the trainer's
    policy) stays within tolerance of the fp32-forward loss value."""
    from super_gradients_tpu.training.losses import get_loss

    model = sg.models.get("ppyoloe_s", num_classes=5)
    x = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3), jnp.float32)
    out32, _ = model.module.apply(model.variables, x, train=True, mutable=["batch_stats"])
    outbf_raw, _ = model.module.apply(
        to_bf16(model.variables), x.astype(jnp.bfloat16), train=True, mutable=["batch_stats"]
    )
    outbf = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a, outbf_raw
    )
    rng = np.random.RandomState(2)
    targets = np.zeros((2, 8, 5), np.float32)  # [cls, x1, y1, x2, y2] padded
    for b in range(2):
        for i in range(3):
            x1, y1 = rng.rand(2) * 30
            targets[b, i] = [rng.randint(0, 5), x1, y1, x1 + 5 + rng.rand() * 20, y1 + 5 + rng.rand() * 20]
    criterion = get_loss("PPYoloELoss", {"num_classes": 5})
    l32, _ = criterion(out32, jnp.asarray(targets))
    lbf, _ = criterion(outbf, jnp.asarray(targets))
    assert np.isfinite(float(l32)) and np.isfinite(float(lbf))
    np.testing.assert_allclose(float(l32), float(lbf), rtol=0.05)


def _tiny_cls_loaders(n=32, batch=8):
    from super_gradients_tpu.training import dataloaders

    tl = dataloaders.get("classification_test_dataloader", dataloader_params={"batch_size": batch})
    vl = dataloaders.get("classification_test_dataloader", dataloader_params={"batch_size": batch})
    return tl, vl


def _tp(**over):
    tp = {
        "max_epochs": 1,
        "lr_mode": "CosineLRScheduler",
        "initial_lr": 0.02,
        "loss": "CrossEntropyLoss",
        "optimizer": "SGD",
        "valid_metrics_list": ["Accuracy"],
        "metric_to_watch": "Accuracy",
        "average_best_models": False,
        "save_model": False,
    }
    tp.update(over)
    return tp


def test_trainer_mixed_precision_end_to_end(tmp_path):
    """mixed_precision=True trains: params/EMA/BN buffers stay fp32, the loss
    trajectory tracks the fp32 run, and the flag is consumed (not dropped)."""
    tl, vl = _tiny_cls_loaders()
    losses = {}
    for mp in (False, True):
        trainer = sg.Trainer(experiment_name=f"mp_{mp}", ckpt_root_dir=str(tmp_path))
        model = sg.models.get("resnet18", num_classes=10)
        trainer.train(model, _tp(mixed_precision=mp, ema=True, seed=3), tl, vl)
        st = trainer.train_state
        assert _tree_dtypes(st.params) == {jnp.dtype(jnp.float32)}
        assert jnp.dtype(jnp.bfloat16) not in _tree_dtypes(st.batch_stats)
        assert _tree_dtypes(st.ema_params) == {jnp.dtype(jnp.float32)}
        losses[mp] = trainer.train_loss_history[-1]
        assert "mixed_precision" not in trainer.unconsumed_training_params
    assert np.isfinite(losses[True])
    # same data order/seed: bf16 compute may drift but must track fp32
    np.testing.assert_allclose(losses[True], losses[False], rtol=0.1)


def test_silent_drop_guard_all_defaults_consumed(tmp_path):
    """Every key in default_train_params.yaml must be consumed by the Trainer —
    regression for the mixed_precision silent-drop (round-3 VERDICT missing #1)."""
    tl, vl = _tiny_cls_loaders()
    trainer = sg.Trainer(experiment_name="guard", ckpt_root_dir=str(tmp_path))
    model = sg.models.get("resnet18", num_classes=10)
    trainer.train(model, _tp(max_train_batches=2, max_valid_batches=2), tl, vl)
    assert trainer.unconsumed_training_params == [], (
        f"silently dropped training_params keys: {trainer.unconsumed_training_params}"
    )


def test_silent_drop_guard_flags_unknown_key(tmp_path, caplog):
    tl, vl = _tiny_cls_loaders()
    trainer = sg.Trainer(experiment_name="guard2", ckpt_root_dir=str(tmp_path))
    model = sg.models.get("resnet18", num_classes=10)
    trainer.train(model, _tp(max_train_batches=2, totally_bogus_knob=1), tl, vl)
    assert "totally_bogus_knob" in trainer.unconsumed_training_params


def test_step_lr_update_freq():
    """step_lr_update_freq generates decays every N epochs, skipping warmup
    (ref callbacks.py:400-416 StepLRCallback)."""
    from super_gradients_tpu.training.schedules import build_lr_schedule

    sched = build_lr_schedule(
        lr_mode="StepLRScheduler", initial_lr=1.0, max_epochs=10, steps_per_epoch=10,
        step_lr_update_freq=3, lr_decay_factor=0.1,
    )
    # decays at epochs 3, 6, 9 -> steps 30, 60, 90
    assert float(sched(0.0)) == pytest.approx(1.0)
    assert float(sched(35.0)) == pytest.approx(0.1)
    assert float(sched(65.0)) == pytest.approx(0.01)
    assert float(sched(95.0)) == pytest.approx(0.001, rel=1e-5)
    with pytest.raises(ValueError):
        build_lr_schedule(lr_mode="StepLRScheduler", initial_lr=1.0, max_epochs=10,
                          steps_per_epoch=10, step_lr_update_freq=3, lr_updates=[2])


def test_load_opt_params_false_resets_momentum(tmp_path):
    """resume with load_opt_params=False starts momentum fresh
    (ref sg_trainer.py:1331,1419)."""
    tl, vl = _tiny_cls_loaders()
    base = _tp(save_model=True, optimizer="SGD", optimizer_params={"momentum": 0.9})
    trainer = sg.Trainer(experiment_name="optres", ckpt_root_dir=str(tmp_path))
    model = sg.models.get("resnet18", num_classes=10)
    trainer.train(model, base, tl, vl)

    def _max_abs_opt(state):
        leaves = [np.abs(np.asarray(l)).max() for l in jax.tree_util.tree_leaves(state.opt_state)
                  if hasattr(l, "dtype") and jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
        return max(leaves) if leaves else 0.0

    for load_opt, expect_fresh in ((True, False), (False, True)):
        t2 = sg.Trainer(experiment_name="optres", ckpt_root_dir=str(tmp_path))
        m2 = sg.models.get("resnet18", num_classes=10)
        # max_epochs == saved epoch+1 -> resume restores state, runs 0 new steps
        t2.train(m2, dict(base, resume=True, load_opt_params=load_opt, save_model=False), tl, vl)
        mx = _max_abs_opt(t2.train_state)
        assert (mx == 0.0) == expect_fresh, f"load_opt_params={load_opt}: opt max {mx}"
