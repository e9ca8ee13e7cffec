"""Model FLOPs/params summary (reference ``utils/get_model_stats.py``).

The reference walks torch modules counting params and estimating FLOPs with
hooks; here XLA itself is the source of truth — ``jax.jit(...).lower().compile()``
exposes the compiler's own flop/byte counts (``cost_analysis``), which include
fusion effects the hook-based estimate cannot see.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(variables) -> Dict[str, int]:
    """Total and per-collection leaf-element counts."""
    out = {}
    total = 0
    for collection, tree in variables.items():
        n = int(sum(np.prod(np.shape(leaf)) for leaf in jax.tree_util.tree_leaves(tree)))
        out[collection] = n
        total += n
    out["total"] = total
    return out


def get_model_stats(
    module,
    variables,
    input_hw: Tuple[int, int] = (224, 224),
    batch_size: int = 1,
    in_channels: int = 3,
    dtype=jnp.float32,
) -> Dict:
    """Compile the forward once on this host's backend and report XLA's numbers.

    Returns dict with: params (per collection + total), flops (per forward),
    flops_per_image, bytes_accessed, peak_memory_bytes (when the backend reports
    them; CPU/TPU availability differs — missing keys are None).
    """
    x = jnp.zeros((batch_size, *input_hw, in_channels), dtype)

    def fwd(v, x):
        return module.apply(v, x, train=False)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_bytes": getattr(ma, "argument_size_in_bytes", None),
            "output_bytes": getattr(ma, "output_size_in_bytes", None),
            "temp_bytes": getattr(ma, "temp_size_in_bytes", None),
        }
    except Exception:  # memory_analysis is backend-dependent
        pass

    flops = cost.get("flops")
    return {
        "params": count_params(variables),
        "flops": flops,
        "flops_per_image": (flops / batch_size) if flops else None,
        "bytes_accessed": cost.get("bytes accessed"),
        **mem,
    }


def format_model_stats(stats: Dict) -> str:
    """Human-readable summary block (the reference's printed table analogue)."""
    p = stats["params"]
    lines = [
        f"params: {p['total']:,} total "
        + " ".join(f"[{k}: {v:,}]" for k, v in p.items() if k != "total"),
    ]
    if stats.get("flops"):
        lines.append(f"flops/forward: {stats['flops']/1e9:.2f} GFLOP "
                     f"({(stats['flops_per_image'] or 0)/1e9:.2f} GFLOP/img)")
    if stats.get("temp_bytes"):
        lines.append(f"XLA temp memory: {stats['temp_bytes']/1e6:.1f} MB")
    return "\n".join(lines)
