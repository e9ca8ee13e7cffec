"""CLI: ``python -m super_gradients_tpu.train_from_recipe --config-name=<recipe> [k=v ...]``

Reference parity: ``src/super_gradients/train_from_recipe.py`` (a thin @hydra.main
wrapper over ``Trainer.train_from_config``). Overrides use the same dotted ``a.b=v``
syntax.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train from a YAML recipe")
    parser.add_argument("--config-name", required=True, help="recipe name (builtin or in --config-dir)")
    parser.add_argument("--config-dir", default=None, help="directory with recipe YAMLs")
    parser.add_argument("overrides", nargs="*", help="dotted overrides like training_hyperparams.max_epochs=5")
    args = parser.parse_args(argv)

    from super_gradients_tpu import init_trainer, setup_device
    from super_gradients_tpu.common.config import load_recipe
    from super_gradients_tpu.training.trainer import Trainer

    init_trainer()
    cfg = load_recipe(args.config_name, config_dir=args.config_dir, overrides=args.overrides)
    setup_device(num_devices=cfg.get("num_devices"))
    model, trainer = Trainer.train_from_config(cfg)
    print(f"Training complete. Best {cfg.get('training_hyperparams', {}).get('metric_to_watch')}: {trainer.best_metric}")
    return model, trainer


if __name__ == "__main__":
    main()
