"""Object-from-config factories.

Mirrors the reference ``common/factories/base_factory.py:26-56`` and
``common/decorators/factory_decorator.py:11``: a config value that names an object may
be a plain string (``"SGD"``), a one-key dict (``{"CosineLRScheduler": {...}}``), or an
already-built instance; factories resolve all three uniformly.
"""

from __future__ import annotations

import functools
import inspect
from typing import Any, Callable, Dict, Mapping, Optional

from super_gradients_tpu.common.registry import ALL_REGISTRIES


class FactoryError(ValueError):
    pass


class BaseFactory:
    """Resolve ``str | {name: params} | instance`` into an instance.

    Reference parity: ``common/factories/base_factory.py:26``.
    """

    def __init__(self, type_dict: Mapping[str, Callable]):
        self.type_dict = type_dict

    def get(self, conf: Any) -> Any:
        if conf is None:
            return None
        if isinstance(conf, str):
            return self._instantiate(conf, {})
        if isinstance(conf, Mapping):
            if len(conf) != 1:
                raise FactoryError(
                    f"Factory config dict must have exactly one key (the type name); got {list(conf)}"
                )
            (name, params), = conf.items()
            params = dict(params or {})
            return self._instantiate(name, params)
        return conf  # already an instance

    def _instantiate(self, name: str, params: Dict[str, Any]) -> Any:
        if name not in self.type_dict:
            close = [k for k in self.type_dict if k.lower() == name.lower()]
            hint = f" Did you mean `{close[0]}`?" if close else ""
            raise FactoryError(
                f"Unknown type name `{name}`. Registered: {sorted(self.type_dict)[:40]}...{hint}"
            )
        return self.type_dict[name](**params)


class TypeFactory(BaseFactory):
    """Resolve a name to the registered *type itself* (not an instance)."""

    def get(self, conf: Any) -> Any:
        if isinstance(conf, str):
            if conf not in self.type_dict:
                raise FactoryError(f"Unknown type name `{conf}`")
            return self.type_dict[conf]
        return conf


class ListFactory:
    def __init__(self, factory: BaseFactory):
        self.factory = factory

    def get(self, conf: Any) -> Any:
        if conf is None:
            return None
        if isinstance(conf, (list, tuple)):
            return [self.factory.get(c) for c in conf]
        return [self.factory.get(conf)]


def factory_for(registry_name: str) -> BaseFactory:
    return BaseFactory(ALL_REGISTRIES[registry_name])


def resolve_param(param_name: str, factory: BaseFactory):
    """Decorator: run ``factory.get`` on ``param_name`` before calling the function.

    Reference parity: ``common/decorators/factory_decorator.py:11``.
    """

    def decorator(fn):
        sig = inspect.signature(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            bound = sig.bind_partial(*args, **kwargs)
            if param_name in bound.arguments:
                bound.arguments[param_name] = factory.get(bound.arguments[param_name])
            return fn(*bound.args, **bound.kwargs)

        return wrapper

    return decorator
