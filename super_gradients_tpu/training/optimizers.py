"""Optimizer factory (optax) with zero-weight-decay param groups.

Reference parity: ``training/utils/optimizer_utils.py:32-238`` — ``build_optimizer``
splits params into (weights-with-WD | biases+BN-without-WD) when
``zero_weight_decay_on_bias_and_bn`` is set. Here the split is an ``optax.masked``
weight-decay transform over the param pytree: BN params are recognized by flax
naming (``scale``/``bias`` leaves of BatchNorm modules and any 1-D leaf).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from super_gradients_tpu.common.registry import register_optimizer


def _wd_mask(params) -> Any:
    """True where weight decay applies: rank>=2 kernels only (conv/dense weights).

    Matches the reference's separation (optimizer_utils.py:32-87): biases and all
    batch-norm affine params (which are 1-D) get no decay.
    """
    return jax.tree_util.tree_map(lambda p: jnp.ndim(p) >= 2, params)


@register_optimizer("SGD")
def sgd(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0, nesterov: bool = False, zero_wd_mask=None, **kw):
    tx = optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov)
    return _with_decay(tx, learning_rate, weight_decay, zero_wd_mask, decoupled=False, momentum=momentum, nesterov=nesterov)


@register_optimizer("Adam")
def adam(learning_rate, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, zero_wd_mask=None, **kw):
    if weight_decay:
        return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay, mask=zero_wd_mask)
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)


@register_optimizer("AdamW")
def adamw(learning_rate, weight_decay: float = 1e-2, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, zero_wd_mask=None, **kw):
    return optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay, mask=zero_wd_mask)


@register_optimizer("RMSProp")
@register_optimizer("RMSprop")  # reference spells it both ways (torch class name)
def rmsprop(learning_rate, momentum: float = 0.9, weight_decay: float = 0.0, decay: float = 0.9, eps: float = 1e-8, zero_wd_mask=None, **kw):
    tx = optax.rmsprop(learning_rate, decay=decay, eps=eps, momentum=momentum)
    return _with_decay(tx, learning_rate, weight_decay, zero_wd_mask)


@register_optimizer("Lion")
def lion(learning_rate, weight_decay: float = 0.0, b1: float = 0.9, b2: float = 0.99, zero_wd_mask=None, **kw):
    return optax.lion(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay, mask=zero_wd_mask)


def _with_decay(tx, learning_rate, weight_decay, mask, decoupled=False, **_):
    """Apply L2 weight decay BEFORE the optimizer (torch-style coupled decay)."""
    if not weight_decay:
        return tx
    wd = optax.add_decayed_weights(weight_decay, mask=mask)
    return optax.chain(wd, tx)


def lr_group_multipliers(params, lr_dict: Dict[str, float]):
    """Per-leaf LR multiplier tree from a ``{param-path-prefix: lr, "default": lr}``
    mapping (ref optimizer_utils.py:145-194 ``separate_lr_groups`` /
    ``initialize_param_groups`` — the reference's per-group LRs become per-leaf
    update scales here; ``lr == 0`` freezes the group). Multipliers are relative to
    ``lr_dict["default"]``, which drives the shared schedule."""
    import jax

    if "default" not in lr_dict:
        raise RuntimeError("When passing initial_lr as a dictionary, must pass 'default'.")
    default = float(lr_dict["default"])
    groups = {k: float(v) for k, v in lr_dict.items() if k != "default"}
    if default == 0 and any(v for v in groups.values()):
        raise RuntimeError("initial_lr['default'] must be non-zero when other groups train")

    def mult_for(path) -> float:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        best = None
        for prefix, lr in groups.items():
            if (name.startswith(prefix) or ("/" + prefix) in name) and (best is None or len(prefix) > best[0]):
                best = (len(prefix), lr)
        lr = best[1] if best is not None else default
        return lr / default if default else 0.0

    return jax.tree_util.tree_map_with_path(lambda p, _: mult_for(p), params)


def _scale_by_group_multipliers(multipliers) -> optax.GradientTransformation:
    import jax

    def update(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, m: u * m, updates, multipliers), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def build_optimizer(
    optimizer: str,
    params,
    lr_schedule: Callable,
    optimizer_params: Optional[Dict] = None,
    zero_weight_decay_on_bias_and_bn: bool = False,
    lr_group_dict: Optional[Dict[str, float]] = None,
) -> optax.GradientTransformation:
    """Build an optax optimizer (ref ``build_optimizer``, optimizer_utils.py:88).

    ``lr_group_dict``: per-group LRs keyed by param-path prefix (+ "default") — the
    reference's dict-``initial_lr`` fine-tuning API; applied as per-leaf update
    scales chained after the optimizer."""
    from super_gradients_tpu.common.registry import OPTIMIZERS

    if optimizer not in OPTIMIZERS:
        # case-insensitive fallback (recipes write "SGD"/"Adam"/"adam" — ref accepts all)
        ci = {k.lower(): k for k in OPTIMIZERS}
        if str(optimizer).lower() in ci:
            optimizer = ci[str(optimizer).lower()]
        else:
            raise KeyError(f"Unknown optimizer `{optimizer}`; registered: {sorted(OPTIMIZERS)}")
    opt_params = dict(optimizer_params or {})
    # YAML 1.1 parses bare "1e-4" as a string — coerce numeric-looking values
    for k, v in opt_params.items():
        if isinstance(v, str):
            try:
                opt_params[k] = float(v)
            except ValueError:
                pass
    mask = _wd_mask(params) if zero_weight_decay_on_bias_and_bn else None
    tx = OPTIMIZERS[optimizer](learning_rate=lr_schedule, zero_wd_mask=mask, **opt_params)
    if lr_group_dict:
        tx = optax.chain(tx, _scale_by_group_multipliers(lr_group_multipliers(params, lr_group_dict)))
    return tx
