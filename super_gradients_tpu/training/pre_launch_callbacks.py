"""Pre-launch callbacks: config modification before training starts.

Reference: ``training/pre_launch_callbacks/pre_launch_callbacks.py`` —
``AutoTrainBatchSizeSelectionCallback`` (:36, OOM-probe batch search + linear LR
scaling) and ``modify_params_for_qat`` / ``QATRecipeModificationCallback``
(:187-336: lr/10, epochs/10, EMA off, augmentations softened for QAT fine-tune).

TPU twist: instead of try/except-OOM probing (slow, crashy), batch-size selection
uses XLA's compile-time ``memory_analysis()`` — the compiler reports exact HBM needs
per candidate batch before anything runs.
"""

from __future__ import annotations

import copy
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.registry import register_pre_launch_callback

logger = get_logger(__name__)


def estimate_train_step_memory_gb(model, batch_size: int, image_hw, loss_fn) -> Optional[float]:
    """Compile (without running) a grad step and read XLA's memory analysis."""

    module = model.module

    def step(params, batch_stats, images, targets):
        def loss(p):
            out = module.apply({"params": p, "batch_stats": batch_stats}, images, train=True, mutable=["batch_stats"])[0] \
                if batch_stats else module.apply({"params": p}, images, train=True)
            l, _ = loss_fn(out, targets)
            return l

        return jax.grad(loss)(params)

    img_spec = jax.ShapeDtypeStruct((batch_size, image_hw[0], image_hw[1], 3), jnp.float32)
    tgt_spec = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    try:
        compiled = jax.jit(step).lower(model.params, model.batch_stats, img_spec, tgt_spec).compile()
        mem = compiled.memory_analysis()
        total = getattr(mem, "temp_size_in_bytes", 0) + getattr(mem, "argument_size_in_bytes", 0) + getattr(
            mem, "output_size_in_bytes", 0
        )
        return total / 1e9
    except Exception as e:
        logger.debug(f"memory analysis failed: {e}")
        return None


@register_pre_launch_callback("AutoTrainBatchSizeSelectionCallback")
class AutoTrainBatchSizeSelectionCallback:
    """Pick the largest batch that fits HBM, scale LR linearly (ref :36-186)."""

    def __init__(self, min_batch_size: int = 8, size_step: int = 8, max_batch_size: int = 512,
                 hbm_budget_gb: float = 14.0, scale_lr: bool = True):
        self.min_batch_size = min_batch_size
        self.size_step = size_step
        self.max_batch_size = max_batch_size
        self.hbm_budget_gb = hbm_budget_gb
        self.scale_lr = scale_lr

    def __call__(self, cfg: Dict, model=None, loss_fn=None, image_hw=(224, 224)) -> Dict:
        cfg = copy.deepcopy(cfg)
        if model is None or loss_fn is None:
            return cfg
        chosen = self.min_batch_size
        bs = self.min_batch_size
        while bs <= self.max_batch_size:
            gb = estimate_train_step_memory_gb(model, bs, image_hw, loss_fn)
            if gb is None or gb > self.hbm_budget_gb:
                break
            chosen = bs
            bs *= 2
        base_bs = cfg.get("dataset_params", {}).get("train_dataloader_params", {}).get("batch_size", chosen)
        cfg.setdefault("dataset_params", {}).setdefault("train_dataloader_params", {})["batch_size"] = chosen
        if self.scale_lr and base_bs:
            tp = cfg.setdefault("training_hyperparams", {})
            tp["initial_lr"] = float(tp.get("initial_lr", 0.01)) * chosen / base_bs
        logger.info(f"AutoTrainBatchSizeSelection: batch_size={chosen}")
        return cfg


def modify_params_for_qat(training_hyperparams: Dict, quantization_params: Optional[Dict] = None) -> Dict:
    """QAT fine-tune recipe adjustments (ref pre_launch_callbacks.py:187-336):
    lr/10, epochs/10 (min 1), EMA off, cosine_final_lr_ratio preserved, warmup off,
    phase callbacks kept."""
    tp = copy.deepcopy(training_hyperparams)
    tp["initial_lr"] = float(tp.get("initial_lr", 0.01)) / 10.0
    tp["max_epochs"] = max(1, int(tp.get("max_epochs", 10)) // 10)
    tp["ema"] = False
    tp["lr_warmup_epochs"] = 0
    tp["lr_warmup_steps"] = 0
    tp["average_best_models"] = False
    return tp


@register_pre_launch_callback("QATRecipeModificationCallback")
class QATRecipeModificationCallback:
    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __call__(self, cfg: Dict, **_):
        cfg = copy.deepcopy(cfg)
        cfg["training_hyperparams"] = modify_params_for_qat(cfg.get("training_hyperparams", {}))
        return cfg
