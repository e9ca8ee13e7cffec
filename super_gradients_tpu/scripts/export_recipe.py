"""Save a fully-composed (inheritance-free) recipe YAML.

Reference parity: ``scripts/export_recipe.py`` + ``cfg_utils.py export_recipe`` —
compose the defaults-list / interpolations and dump one standalone file.

Usage:
    python -m super_gradients_tpu.scripts.export_recipe --config-name=cifar10_resnet \
        [--config-dir=DIR] [--save-path=OUT.yaml] [overrides...]
"""

from __future__ import annotations

import argparse
import os


def export_recipe(config_name: str, config_dir: str = None, save_path: str = None, overrides=None) -> str:
    import yaml

    from super_gradients_tpu.common.config import load_recipe

    cfg = load_recipe(config_name, config_dir=config_dir, overrides=overrides or [])
    if save_path is None:
        save_path = os.path.join(os.getcwd(), config_name.replace(".yaml", "") + "_complete.yaml")
    with open(save_path, "w") as f:
        yaml.safe_dump(dict(cfg), f, sort_keys=False)
    return save_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Export a composed recipe to one standalone YAML")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("--save-path", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    out = export_recipe(args.config_name, args.config_dir, args.save_path, args.overrides)
    print(f"Saved composed recipe to {out}")
    return out


if __name__ == "__main__":
    main()
