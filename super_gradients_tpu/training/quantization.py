"""Post-training quantization (PTQ) — int8 simulation + calibration.

Reference parity: ``training/utils/quantization/`` — ``SelectiveQuantizer``
(selective_quantization_utils.py:50, skip-lists by module name),
``QuantizationCalibrator`` (calibrator.py:27, max/percentile histogram calibration),
``ptq()`` (ptq.py:14). The reference rides nvidia pytorch-quantization fake-quant
CUDA kernels; here quantization is pure pytree math:

- weights: symmetric per-output-channel int8 (conv HWIO → scale per O; dense per col)
- activations: per-tensor scales calibrated by running batches with flax
  ``capture_intermediates`` and reducing max/percentile statistics
- ``quantize_model_weights`` returns REAL int8 arrays + scales (storage/serving);
  ``fake_quantize_params`` returns float params that went through the int8 grid
  (accuracy simulation — the exact analogue of fake-quant QAT forward)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.registry import register_quantizer

logger = get_logger(__name__)


def _quant_axes(path: Tuple[str, ...], leaf: jnp.ndarray) -> Optional[Tuple[int, ...]]:
    """Reduction axes for per-channel scales; None = skip this leaf."""
    if path[-1] != "kernel":
        return None  # only weight kernels are quantized (biases/BN stay fp32)
    if leaf.ndim == 4:  # conv HWIO -> per-O
        return (0, 1, 2)
    if leaf.ndim == 2:  # dense [in, out] -> per-out
        return (0,)
    return None


def _iter_leaves(tree, prefix=()):
    for k, v in tree.items():
        p = prefix + (str(k),)
        if isinstance(v, dict):
            yield from _iter_leaves(v, p)
        else:
            yield p, v


def _map_leaves(tree, fn, prefix=()):
    out = {}
    for k, v in tree.items():
        p = prefix + (str(k),)
        out[k] = _map_leaves(v, fn, p) if isinstance(v, dict) else fn(p, v)
    return out


@dataclasses.dataclass
class QuantizedParams:
    int8_params: Dict
    scales: Dict
    skipped: List[str]

    def dequantized(self) -> Dict:
        def deq(p, v):
            if isinstance(v, dict) and set(v) == {"q", "scale"}:
                return v["q"].astype(jnp.float32) * v["scale"]
            return v

        def walk(tree):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict) and set(v) == {"q", "scale"}:
                    out[k] = v["q"].astype(jnp.float32) * v["scale"]
                elif isinstance(v, dict):
                    out[k] = walk(v)
                else:
                    out[k] = v
            return out

        return walk(self.int8_params)


@register_quantizer("SelectiveQuantizer")
class SelectiveQuantizer:
    """Weight int8 quantizer with name-based skip lists (ref :50-315)."""

    def __init__(self, skip_modules: Optional[Sequence[str]] = None, per_channel: bool = True):
        self.skip_modules = list(skip_modules or [])
        self.per_channel = per_channel

    def _skip(self, path: Tuple[str, ...]) -> bool:
        name = "/".join(path)
        return any(s in name for s in self.skip_modules)

    def quantize_module(self, params: Dict) -> QuantizedParams:
        skipped: List[str] = []

        def q(path, leaf):
            axes = _quant_axes(path, leaf)
            if axes is None or self._skip(path):
                if path[-1] == "kernel":
                    skipped.append("/".join(path))
                return leaf
            if not self.per_channel:
                axes = tuple(range(leaf.ndim))
            amax = jnp.max(jnp.abs(leaf), axis=axes, keepdims=True)
            scale = jnp.maximum(amax / 127.0, 1e-12)
            qv = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
            return {"q": qv, "scale": scale.astype(jnp.float32)}

        int8 = _map_leaves(params, q)
        return QuantizedParams(int8_params=int8, scales={}, skipped=skipped)


def fake_quantize_params(params: Dict, skip_modules: Optional[Sequence[str]] = None, per_channel: bool = True) -> Dict:
    """Round-trip weights through the int8 grid (fake-quant simulation)."""
    qp = SelectiveQuantizer(skip_modules, per_channel).quantize_module(params)
    return qp.dequantized()


@dataclasses.dataclass
class CalibrationTable:
    """Per-layer activation ranges: name -> (amax,)"""

    ranges: Dict[str, float]


class QuantizationCalibrator:
    """Activation-range calibration via captured intermediates (ref calibrator.py:27).

    method: "max" | "percentile" (99.9 by default, matching the reference default).
    """

    def __init__(self, method: str = "percentile", percentile: float = 99.9):
        self.method = method
        self.percentile = percentile

    def calibrate_model(self, model, batches: Sequence, num_batches: int = 16) -> CalibrationTable:
        ranges: Dict[str, List[float]] = {}
        for bi, batch in enumerate(batches):
            if bi >= num_batches:
                break
            inputs = jnp.asarray(batch[0] if isinstance(batch, (tuple, list)) else batch)
            _, state = model.module.apply(
                model.variables, inputs, train=False, capture_intermediates=True, mutable=["intermediates"]
            )
            flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
            for path, value in flat:
                if not hasattr(value, "ndim") or value.ndim == 0:
                    continue
                name = _canonical_module_name(path)
                v = np.asarray(jnp.abs(value.astype(jnp.float32)))
                amax = float(np.percentile(v, self.percentile)) if self.method == "percentile" else float(v.max())
                # a module may emit several tensors (tuple outputs) — keep the widest
                ranges.setdefault(name, []).append(amax)
        return CalibrationTable({k: float(np.mean(v)) for k, v in ranges.items()})


def _canonical_module_name(path) -> str:
    """Normalize a captured-intermediates key path to the module path the QAT
    interceptor sees: alphanumeric module names only, no ``__call__``/indices."""
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None or key == "__call__" or key == "intermediates":
            continue
        parts.append(str(key))
    return "/".join(parts)


# ------------------------------------------------------------------ real QAT
# In-graph fake quantization with straight-through gradients, consuming the
# calibration table (ref selective_quantization_utils.py:50 — nvidia
# pytorch-quantization TensorQuantizers on weights AND activations; here the
# activation quantizers are a flax method interceptor over module outputs).


def fake_quant_ste(x: jnp.ndarray, scale, qmin: int = -127, qmax: int = 127) -> jnp.ndarray:
    """Round to the int8 grid with a straight-through gradient estimator."""
    q = jnp.clip(jnp.round(x / scale), qmin, qmax) * scale
    return x + jax.lax.stop_gradient(q - x)


def fake_quantize_params_ste(params: Dict, skip_modules: Optional[Sequence[str]] = None, per_channel: bool = True) -> Dict:
    """Weight fake-quant with STE — differentiable, usable inside the train step.

    Scales are recomputed from the live weights each call (standard QAT weight
    quantizers track amax of the current weights)."""
    skip = list(skip_modules or [])

    def q(path, leaf):
        axes = _quant_axes(path, leaf)
        if axes is None or any(s in "/".join(path) for s in skip):
            return leaf
        if not per_channel:
            axes = tuple(range(leaf.ndim))
        amax = jax.lax.stop_gradient(jnp.max(jnp.abs(leaf), axis=axes, keepdims=True))
        scale = jnp.maximum(amax / 127.0, 1e-12)
        return fake_quant_ste(leaf, scale)

    return _map_leaves(params, q)


def make_qat_forward(module, qat_params: Dict):
    """Build (apply_fn, param_transform) implementing in-graph QAT.

    ``qat_params`` keys:
      - ``calibration_table``: :class:`CalibrationTable` (or its ``ranges`` dict)
        with per-module activation amax — REQUIRED for activation quantization.
      - ``quantize_weights`` (default True): STE weight fake-quant in the step.
      - ``quantize_activations`` (default True): per-tensor activation fake-quant
        applied to every calibrated module's ``__call__`` output via a flax
        method interceptor.
      - ``skip_modules``: name fragments excluded from both.

    The returned ``apply_fn(variables, *args, **kwargs)`` is a drop-in for
    ``module.apply``; ``param_transform`` is applied to params inside the loss.
    """
    import flax.linen as nn

    table = qat_params.get("calibration_table")
    ranges: Dict[str, float] = dict(getattr(table, "ranges", table or {}))
    skip = list(qat_params.get("skip_modules") or [])
    quantize_weights = bool(qat_params.get("quantize_weights", True))
    quantize_acts = bool(qat_params.get("quantize_activations", True)) and bool(ranges)
    per_channel = bool(qat_params.get("per_channel", True))

    act_scales = {
        name: max(amax, 1e-12) / 127.0
        for name, amax in ranges.items()
        if not any(s in name for s in skip)
    }

    def _quant_out(out, scale):
        def maybe_q(x):
            if hasattr(x, "dtype") and hasattr(x, "ndim") and jnp.issubdtype(x.dtype, jnp.floating) and x.ndim > 0:
                return fake_quant_ste(x, scale)
            return x

        return jax.tree_util.tree_map(maybe_q, out)

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if context.method_name != "__call__":
            return out
        name = "/".join(context.module.path)
        scale = act_scales.get(name)
        if scale is not None:
            out = _quant_out(out, scale)
        return out

    def apply_fn(variables, *args, **kwargs):
        if not quantize_acts:
            return module.apply(variables, *args, **kwargs)
        with nn.intercept_methods(interceptor):
            return module.apply(variables, *args, **kwargs)

    param_transform = (lambda p: fake_quantize_params_ste(p, skip, per_channel)) if quantize_weights else (lambda p: p)
    return apply_fn, param_transform


def ptq(
    model,
    calibration_loader=None,
    calibration_batches: int = 16,
    method: str = "percentile",
    skip_modules: Optional[Sequence[str]] = None,
):
    """Post-training quantization (ref ptq.py:14-65): calibrate + fake-quant weights.

    Returns (model with int8-gridded weights, CalibrationTable | None). The model
    keeps its fp32 compute path; weights sit exactly on the int8 grid so accuracy
    matches a true int8 engine's weight error.
    """
    table = None
    if calibration_loader is not None:
        calibrator = QuantizationCalibrator(method=method)
        table = calibrator.calibrate_model(model, calibration_loader, calibration_batches)
        logger.info(f"Calibrated {len(table.ranges)} activation tensors")
    variables = dict(model.variables)
    variables["params"] = fake_quantize_params(variables["params"], skip_modules)
    model.update_variables(variables)
    return model, table
