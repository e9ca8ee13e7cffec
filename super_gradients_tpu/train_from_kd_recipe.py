"""CLI: ``python -m super_gradients_tpu.train_from_kd_recipe --config-name=<recipe> [k=v ...]``

Reference parity: ``src/super_gradients/train_from_kd_recipe.py`` (thin wrapper over
``KDTrainer.train_from_config``).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Knowledge-distillation training from a YAML recipe")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from super_gradients_tpu import init_trainer, setup_device
    from super_gradients_tpu.common.config import load_recipe
    from super_gradients_tpu.training.kd_trainer import KDTrainer

    init_trainer()
    cfg = load_recipe(args.config_name, config_dir=args.config_dir, overrides=args.overrides)
    setup_device(num_devices=cfg.get("num_devices"))
    student, trainer = KDTrainer.train_from_config(cfg)
    print(f"KD training complete. Best metric: {trainer.best_metric}")
    return student, trainer


if __name__ == "__main__":
    main()
