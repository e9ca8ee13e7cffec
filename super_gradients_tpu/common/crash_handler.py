"""Crash tips: pattern-matched advice appended to uncaught exceptions.

Reference parity: ``common/crash_handler/crash_handler.py:9`` and
``crash_tips.py:102-241``. The tip catalog here targets the JAX/TPU failure modes a user
of this framework will actually hit (shape polymorphism under jit, OOM on HBM, donated
buffers, mesh mismatches) instead of the reference's CUDA/DDP tips.
"""

from __future__ import annotations

import re
import sys
import traceback
from typing import List, Optional, Tuple

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)

# (regex on "ExcType: message", tip)
_CRASH_TIPS: List[Tuple[str, str]] = [
    (
        r"(ConcretizationTypeError|TracerBoolConversionError|Abstract tracer value)",
        "A traced (jit) value was used in Python control flow. Move data-dependent branching "
        "to jax.lax.cond / jnp.where, or mark the argument static (static_argnums).",
    ),
    (
        r"RESOURCE_EXHAUSTED|Out of memory|OOM",
        "TPU HBM out of memory. Lower batch_size, enable gradient accumulation "
        "(training_params.batch_accumulate), use bf16 (mixed_precision=True), or shard the "
        "model over more chips (parallel.setup_device(num_devices=...)).",
    ),
    (
        r"incompatible shapes|Incompatible shapes|got shape",
        "Shape mismatch inside a jitted program. Detection/pose pipelines require static "
        "shapes: check that your dataloader pads targets to [B, max_boxes, ...] and images "
        "to a fixed size (see ops.preprocess.letterbox).",
    ),
    (
        r"donated.*buffer|Invalid buffer passed",
        "A donated array was reused after the jitted call. Train steps donate the input "
        "state for in-place update; keep only the returned state.",
    ),
    (
        r"devices.*mesh|Mesh.*devices",
        "Mesh construction failed. jax.devices() must be divisible by the requested mesh "
        "axes; for local CPU testing set XLA_FLAGS=--xla_force_host_platform_device_count=8.",
    ),
    (
        r"No such file or directory.*\.yaml|Config group file not found",
        "Recipe YAML not found. Pass config_dir= pointing at your recipes directory, or use "
        "one of the builtin recipes in super_gradients_tpu/recipes/.",
    ),
]


def get_relevant_crash_tip_message(exc_type, exc_value, exc_tb) -> Optional[str]:
    text = f"{exc_type.__name__}: {exc_value}"
    for pattern, tip in _CRASH_TIPS:
        if re.search(pattern, text):
            return tip
    return None


_prev_excepthook = None


def _excepthook(exc_type, exc_value, exc_tb):
    tip = get_relevant_crash_tip_message(exc_type, exc_value, exc_tb)
    if _prev_excepthook is not None and _prev_excepthook is not _excepthook:
        _prev_excepthook(exc_type, exc_value, exc_tb)
    else:
        traceback.print_exception(exc_type, exc_value, exc_tb)
    if tip:
        print(f"\n[crash tip] {tip}", file=sys.stderr)


def setup_crash_handler():
    """Install the excepthook (reference: installed at import by ``common/__init__.py:29``)."""
    global _prev_excepthook
    if sys.excepthook is not _excepthook:
        _prev_excepthook = sys.excepthook
        sys.excepthook = _excepthook
