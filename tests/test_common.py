import os

import pytest
import yaml

from super_gradients_tpu.common.config import (
    HpmStruct,
    add_params_to_cfg,
    deep_merge,
    load_recipe,
    raise_if_unused_params,
    resolve_interpolations,
    UnusedConfigParamError,
)
from super_gradients_tpu.common.factories import BaseFactory, FactoryError, resolve_param
from super_gradients_tpu.common.registry import create_register_decorator, RegistryError


def test_registry_roundtrip():
    reg = {}
    register = create_register_decorator(reg)

    @register()
    class Foo:
        pass

    @register("bar_name")
    class Bar:
        pass

    assert reg["Foo"] is Foo and reg["bar_name"] is Bar
    with pytest.raises(RegistryError):

        @register("Foo")
        class Foo2:
            pass


def test_factory_resolution_modes():
    class Thing:
        def __init__(self, a=1, b=2):
            self.a, self.b = a, b

    f = BaseFactory({"Thing": Thing})
    assert f.get("Thing").a == 1
    assert f.get({"Thing": {"a": 5}}).a == 5
    inst = Thing(9)
    assert f.get(inst) is inst
    with pytest.raises(FactoryError):
        f.get("Nope")


def test_resolve_param_decorator():
    class Thing:
        def __init__(self, a=1):
            self.a = a

    f = BaseFactory({"Thing": Thing})

    @resolve_param("x", f)
    def fn(x, y=0):
        return x

    assert fn({"Thing": {"a": 3}}).a == 3
    assert fn(x="Thing").a == 1


def test_deep_merge_and_overrides():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    out = deep_merge(base, {"a": {"b": 10}, "e": 4})
    assert out == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}
    out2 = add_params_to_cfg(out, ["a.c=99", "f.g=[1,2]", "d=hello"])
    assert out2["a"]["c"] == 99 and out2["f"]["g"] == [1, 2] and out2["d"] == "hello"


def test_interpolation():
    cfg = {"x": 2, "y": "${x}", "z": {"w": "${y}"}, "s": "lr=${x}"}
    out = resolve_interpolations(cfg)
    assert out["y"] == 2 and out["z"]["w"] == 2 and out["s"] == "lr=2"


def test_load_recipe_with_defaults(tmp_path):
    (tmp_path / "training_hyperparams").mkdir()
    (tmp_path / "training_hyperparams" / "base.yaml").write_text("max_epochs: 10\ninitial_lr: 0.1\n")
    (tmp_path / "my_recipe.yaml").write_text(
        "defaults:\n  - training_hyperparams: base\n  - _self_\n"
        "training_hyperparams:\n  max_epochs: 5\nexperiment_name: exp1\n"
    )
    cfg = load_recipe("my_recipe", config_dir=str(tmp_path))
    assert cfg["training_hyperparams"]["max_epochs"] == 5
    assert cfg["training_hyperparams"]["initial_lr"] == 0.1
    assert cfg["experiment_name"] == "exp1"


def test_builtin_default_train_params_loads():
    cfg = load_recipe("training_hyperparams/default_train_params.yaml")
    assert "max_epochs" in cfg and "initial_lr" in cfg


def test_hpm_struct():
    h = HpmStruct(a=1, b=2)
    h.override(b=3, c=4)
    assert h.a == 1 and h.b == 3 and h.to_dict() == {"a": 1, "b": 3, "c": 4}
    assert "a" in h and h.get("zz", 7) == 7


def test_raise_if_unused_params():
    with pytest.raises(UnusedConfigParamError):
        with raise_if_unused_params({"used": 1, "unused": 2}) as cfg:
            _ = cfg["used"]
    with raise_if_unused_params({"a": 1, "b": {"c": 2}}) as cfg:
        _ = cfg["a"], cfg["b"]["c"]
