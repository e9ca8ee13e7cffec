"""super_gradients_tpu — TPU-native (JAX/XLA/Pallas) vision training & inference
framework with the capabilities of Deci-AI/super-gradients.

Public surface mirrors the reference (``src/super_gradients/__init__.py``):
``models.get``, ``Trainer``, ``dataloaders``, ``init_trainer``, ``setup_device``.
Subpackages load lazily (PEP 562) so that light-weight uses (ops only) don't pay
model-zoo import cost.
"""

__version__ = "0.1.0"

from super_gradients_tpu.common.crash_handler import setup_crash_handler
from super_gradients_tpu.common.logging_utils import get_logger

setup_crash_handler()

_LAZY = {
    "models": ("super_gradients_tpu.models", None),
    "dataloaders": ("super_gradients_tpu.training.dataloaders", None),
    "Trainer": ("super_gradients_tpu.training.trainer", "Trainer"),
    "setup_device": ("super_gradients_tpu.parallel.mesh", "setup_device"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module_name, attr = _LAZY[name]
        mod = importlib.import_module(module_name)
        obj = mod if attr is None else getattr(mod, attr)
        globals()[name] = obj
        return obj
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def init_trainer():
    """Initialize process runtime (reference ``init_trainer``, ddp_utils.py:14).

    On TPU mesh construction happens in :func:`setup_device`; multi-host init in
    ``setup_device(multi_host=True)``.
    """
    setup_crash_handler()


__all__ = ["models", "dataloaders", "Trainer", "init_trainer", "setup_device", "get_logger", "__version__"]
