"""Recipe / config system (hydra-lite).

The reference composes Hydra YAML recipes (``recipes/*.yaml`` with a ``defaults:`` list
over config groups, ``${...}`` interpolation, and dotted CLI overrides — see
``common/environment/cfg_utils.py:39-230``). Hydra is not a dependency here; this module
implements the subset the recipes actually use:

- ``load_recipe(name, config_dir)`` — load a YAML recipe, resolve its ``defaults:`` list
  (group entries like ``training_hyperparams: default_train_params`` load
  ``<config_dir>/training_hyperparams/default_train_params.yaml``), deep-merge with the
  recipe body winning (``_self_`` ordering honored).
- ``${a.b.c}`` interpolation resolved against the merged tree.
- ``add_params_to_cfg(cfg, ["a.b=3", "x=[1,2]"])`` dotted overrides (YAML-parsed values).
- ``raise_if_unused_params`` — consumption-tracking wrapper mirroring
  ``training/utils/config_utils.py:194-246``.

Configs are plain nested dicts; ``HpmStruct`` (reference ``training/utils/utils.py:49``)
gives attribute access + ``.override()`` + ``.to_dict()``.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Mapping, Optional, Sequence

import yaml

_PKG_RECIPE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "recipes")


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Recursively merge ``override`` into ``base`` (override wins). Returns new dict."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


_INTERP_RE = re.compile(r"\$\{([^}]+)\}")


def _get_path(tree: Dict, dotted: str) -> Any:
    node: Any = tree
    for part in dotted.split("."):
        if isinstance(node, Mapping) and part in node:
            node = node[part]
        else:
            raise KeyError(f"Interpolation key `{dotted}` not found (missing `{part}`)")
    return node


def resolve_interpolations(tree: Dict) -> Dict:
    """Resolve ``${a.b}`` references against the root of ``tree`` (multi-pass)."""

    def resolve_value(v: Any) -> Any:
        if isinstance(v, str):
            m = _INTERP_RE.fullmatch(v.strip())
            if m:  # whole-string interpolation: preserve type
                return _get_path(tree, m.group(1))
            return _INTERP_RE.sub(lambda mm: str(_get_path(tree, mm.group(1))), v)
        if isinstance(v, Mapping):
            return {k: resolve_value(x) for k, x in v.items()}
        if isinstance(v, list):
            return [resolve_value(x) for x in v]
        return v

    prev = None
    out = tree
    for _ in range(10):  # chained interpolations
        out = resolve_value(out)
        if out == prev:
            break
        prev = out
    return out


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    return data or {}


def _resolve_group_file(config_dir: str, group: str, name: str) -> str:
    p = os.path.join(config_dir, group, f"{name}.yaml")
    if os.path.exists(p):
        return p
    builtin = os.path.join(_PKG_RECIPE_DIR, group, f"{name}.yaml")
    if os.path.exists(builtin):
        return builtin
    raise FileNotFoundError(f"Config group file not found: {group}/{name}.yaml (searched {config_dir} and builtin recipes)")


def load_recipe(config_name: str, config_dir: Optional[str] = None, overrides: Optional[Sequence[str]] = None) -> Dict:
    """Load + compose a recipe. Reference parity: ``cfg_utils.py:39`` (``load_recipe``)."""
    config_dir = config_dir or _PKG_RECIPE_DIR
    if config_name.endswith(".yaml"):
        recipe_path = config_name if os.path.isabs(config_name) else os.path.join(config_dir, config_name)
    else:
        recipe_path = os.path.join(config_dir, f"{config_name}.yaml")
        if not os.path.exists(recipe_path):
            recipe_path = os.path.join(_PKG_RECIPE_DIR, f"{config_name}.yaml")
    raw = _load_yaml(recipe_path)

    defaults = raw.pop("defaults", [])
    merged: Dict = {}
    self_merged = False
    for entry in defaults:
        if entry == "_self_":
            merged = deep_merge(merged, raw)
            self_merged = True
            continue
        if isinstance(entry, Mapping):
            (group, name), = entry.items()
            if name is None:
                continue
            sub = _load_yaml(_resolve_group_file(config_dir, str(group), str(name)))
            # nested defaults inside a group file merge within the same group
            sub_defaults = sub.pop("defaults", [])
            for sd in sub_defaults:
                if sd == "_self_" or not isinstance(sd, Mapping):
                    continue
                (g2, n2), = sd.items()
                sub2 = _load_yaml(_resolve_group_file(config_dir, str(g2), str(n2)))
                sub = deep_merge(sub2, sub)
            merged = deep_merge(merged, {str(group): sub})
        else:  # bare file include at root
            sub = _load_yaml(_resolve_group_file(config_dir, "", str(entry)) if "/" in str(entry) else os.path.join(config_dir, f"{entry}.yaml"))
            merged = deep_merge(merged, sub)
    if not self_merged:
        merged = deep_merge(merged, raw)

    if overrides:
        merged = add_params_to_cfg(merged, overrides)
    return apply_recipe_shortcuts(resolve_interpolations(merged))


# Shortcut aliases → nested target paths. Reference: ``recipes/variable_setup.yaml``
# + ``RecipeShortcutsCallback`` (common/environment/omegaconf_utils.py:12-57): a flat
# CLI key like ``lr=0.003`` fans out to ``training_hyperparams.initial_lr``;
# ``num_workers`` fans out to BOTH dataloader_params. When a shortcut is unset, it is
# back-populated from the nested value (clarity in persisted recipes/logs), matching
# the reference's `_override_with_shortcut` both-ways sync.
RECIPE_SHORTCUTS: Dict[str, List[str]] = {
    "lr": ["training_hyperparams.initial_lr"],
    "batch_size": ["dataset_params.train_dataloader_params.batch_size"],
    "val_batch_size": ["dataset_params.val_dataloader_params.batch_size"],
    "ema": ["training_hyperparams.ema"],
    "epochs": ["training_hyperparams.max_epochs"],
    "resume": ["training_hyperparams.resume"],
    "num_workers": [
        "dataset_params.train_dataloader_params.num_workers",
        "dataset_params.val_dataloader_params.num_workers",
    ],
}


def apply_recipe_shortcuts(cfg: Dict) -> Dict:
    """Expand flat shortcut keys (``lr=``, ``batch_size=``, ``epochs=``, ...) into their
    nested recipe paths; back-fill unset shortcuts from the nested values.

    Only applies to ROOT recipes (the composed tree holding the
    ``training_hyperparams`` group / an ``architecture``). Group YAMLs such as
    ``training_hyperparams/default_train_params.yaml`` carry flat keys like
    ``ema``/``resume`` that are REAL parameters, not shortcut aliases —
    expanding them there fabricated phantom ``training_hyperparams``/
    ``dataset_params`` subtrees inside training params, which the silent-drop
    guard then (correctly) reported as unconsumed.
    """
    if not (isinstance(cfg.get("training_hyperparams"), dict) or "architecture" in cfg):
        return cfg
    for key, targets in RECIPE_SHORTCUTS.items():
        short_val = cfg.get(key)
        for dotted in targets:
            parts = dotted.split(".")
            if short_val is not None:
                node = cfg
                for part in parts[:-1]:
                    nxt = node.get(part)
                    if not isinstance(nxt, dict):
                        nxt = {}
                        node[part] = nxt
                    node = nxt
                node[parts[-1]] = copy.deepcopy(short_val)
            elif key in cfg:
                node = cfg
                for part in parts[:-1]:
                    node = node.get(part) if isinstance(node, dict) else None
                    if node is None:
                        break
                if isinstance(node, dict) and node.get(parts[-1]) is not None:
                    cfg[key] = node[parts[-1]]  # back-populate declared-but-unset shortcut
    return cfg


def load_arch_params(config_name: str, recipes_dir_path: Optional[str] = None,
                     overriding_params: Optional[Dict] = None) -> Dict:
    """Load an ``arch_params/`` group YAML (ref ``arch_params_factory.get_arch_params``,
    models/arch_params_factory.py:9): e.g. ``load_arch_params("yolo_nas_s_arch_params")``
    returns the full module-spec tree consumed by ``models.get(..., arch_params=...)``."""
    base = recipes_dir_path or _PKG_RECIPE_DIR
    params = _load_yaml(_resolve_group_file(base, "arch_params", config_name))
    # group-local defaults (ref hydra: e.g. repvgg_a0_arch_params includes
    # repvgg_arch_params); later entries and the file itself win
    for entry in params.pop("defaults", []):
        if entry == "_self_":
            continue
        sub = load_arch_params(str(entry), recipes_dir_path=recipes_dir_path)
        params = deep_merge(sub, params)
    params.update(overriding_params or {})
    return resolve_interpolations(params)


def add_params_to_cfg(cfg: Dict, params: Sequence[str]) -> Dict:
    """Apply dotted ``key=value`` overrides. Reference parity: ``cfg_utils.py:94``."""
    out = copy.deepcopy(cfg)
    for p in params:
        if "=" not in p:
            raise ValueError(f"Override `{p}` must be key=value")
        key, _, val = p.partition("=")
        parsed = yaml.safe_load(val) if val != "" else None
        node = out
        parts = key.strip().split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = parsed
    return out


class HpmStruct:
    """Attribute-access hyper-param struct. Reference: ``training/utils/utils.py:49``."""

    def __init__(self, **entries):
        self.__dict__.update(entries)

    def set_schema(self, schema):  # kept for API parity; validation is lightweight here
        self.__dict__["_schema"] = schema

    def override(self, **entries):
        self.__dict__.update(entries)
        return self

    def to_dict(self, include_schema: bool = False) -> Dict:
        return {k: v for k, v in self.__dict__.items() if include_schema or k != "_schema"}

    def get(self, key, default=None):
        return self.__dict__.get(key, default)

    def __contains__(self, key):
        return key in self.__dict__

    def __repr__(self):
        return f"HpmStruct({self.to_dict()!r})"


class _TrackedDict(dict):
    def __init__(self, data: Dict, used: set, prefix: str):
        super().__init__(data)
        self._used = used
        self._prefix = prefix

    def __getitem__(self, key):
        self._used.add(self._prefix + str(key))
        v = super().__getitem__(key)
        if isinstance(v, dict) and not isinstance(v, _TrackedDict):
            return _TrackedDict(v, self._used, self._prefix + str(key) + ".")
        return v

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default


class UnusedConfigParamError(ValueError):
    pass


class raise_if_unused_params:
    """Context manager: wraps a config dict, raises if any top-level key was never read.

    Reference parity: ``training/utils/config_utils.py:194-246``.
    """

    def __init__(self, cfg: Dict):
        self._used: set = set()
        self.cfg = _TrackedDict(cfg, self._used, "")
        self._keys = set(map(str, cfg.keys()))

    def __enter__(self):
        return self.cfg

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            unused = self._keys - {u.split(".")[0] for u in self._used}
            if unused:
                raise UnusedConfigParamError(f"Unused config params: {sorted(unused)}")
        return False
