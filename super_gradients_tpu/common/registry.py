"""String-name registries: the backbone of the config system.

Mirrors the reference's registry design (super-gradients
``common/registry/registry.py:14-196``): every pluggable object type (model, loss,
metric, transform, dataloader, callback, ...) gets a dict registry plus a
``@register_x`` decorator, so YAML recipes can reference objects by name.

TPU-native notes: registries are pure-Python and framework-agnostic; registered
factories return flax modules / pure functions rather than torch nn.Modules.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Type


class RegistryError(KeyError):
    pass


def create_register_decorator(registry: Dict[str, object]) -> Callable:
    """Create a ``@register(name=None)`` decorator bound to ``registry``.

    Reference parity: ``common/registry/registry.py:14``.
    """

    def register(name: Optional[str] = None) -> Callable:
        def decorator(cls):
            key = name if name is not None else cls.__name__
            if key in registry and registry[key] is not cls:
                raise RegistryError(f"`{key}` already registered as {registry[key]!r}")
            registry[key] = cls
            return cls

        return decorator

    return register


# --- the registries (reference: registry.py:75-196) ---
ARCHITECTURES: Dict[str, Type] = {}
LOSSES: Dict[str, Type] = {}
METRICS: Dict[str, Type] = {}
DATALOADERS: Dict[str, Callable] = {}
DATASETS: Dict[str, Type] = {}
CALLBACKS: Dict[str, Type] = {}
TRANSFORMS: Dict[str, Type] = {}
LR_SCHEDULERS: Dict[str, Callable] = {}
LR_WARMUPS: Dict[str, Callable] = {}
OPTIMIZERS: Dict[str, Callable] = {}
SAMPLERS: Dict[str, Type] = {}
PROCESSINGS: Dict[str, Type] = {}
COLLATE_FUNCTIONS: Dict[str, Type] = {}
SG_LOGGERS: Dict[str, Type] = {}
PRE_LAUNCH_CALLBACKS: Dict[str, Type] = {}
DETECTION_MODULES: Dict[str, Type] = {}
TARGET_GENERATORS: Dict[str, Type] = {}
KD_MODULES: Dict[str, Type] = {}
QUANTIZERS: Dict[str, Type] = {}

register_model = create_register_decorator(ARCHITECTURES)
register_loss = create_register_decorator(LOSSES)
register_metric = create_register_decorator(METRICS)
register_dataloader = create_register_decorator(DATALOADERS)
register_dataset = create_register_decorator(DATASETS)
register_callback = create_register_decorator(CALLBACKS)
register_transform = create_register_decorator(TRANSFORMS)
register_lr_scheduler = create_register_decorator(LR_SCHEDULERS)
register_lr_warmup = create_register_decorator(LR_WARMUPS)
register_optimizer = create_register_decorator(OPTIMIZERS)
register_sampler = create_register_decorator(SAMPLERS)
register_processing = create_register_decorator(PROCESSINGS)
register_collate_function = create_register_decorator(COLLATE_FUNCTIONS)
register_sg_logger = create_register_decorator(SG_LOGGERS)
register_pre_launch_callback = create_register_decorator(PRE_LAUNCH_CALLBACKS)
register_detection_module = create_register_decorator(DETECTION_MODULES)
register_target_generator = create_register_decorator(TARGET_GENERATORS)
register_kd_module = create_register_decorator(KD_MODULES)
register_quantizer = create_register_decorator(QUANTIZERS)

ALL_REGISTRIES: Dict[str, Dict] = {
    "architectures": ARCHITECTURES,
    "losses": LOSSES,
    "metrics": METRICS,
    "dataloaders": DATALOADERS,
    "datasets": DATASETS,
    "callbacks": CALLBACKS,
    "transforms": TRANSFORMS,
    "lr_schedulers": LR_SCHEDULERS,
    "lr_warmups": LR_WARMUPS,
    "optimizers": OPTIMIZERS,
    "samplers": SAMPLERS,
    "processings": PROCESSINGS,
    "collate_functions": COLLATE_FUNCTIONS,
    "sg_loggers": SG_LOGGERS,
    "pre_launch_callbacks": PRE_LAUNCH_CALLBACKS,
    "detection_modules": DETECTION_MODULES,
    "target_generators": TARGET_GENERATORS,
    "kd_modules": KD_MODULES,
    "quantizers": QUANTIZERS,
}
