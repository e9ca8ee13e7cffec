"""CLI: ``python -m super_gradients_tpu.qat_from_recipe --config-name=<recipe> [k=v ...]``

Reference parity: ``src/super_gradients/qat_from_recipe.py`` (thin wrapper over
``Trainer.quantize_from_config`` — PTQ calibrate, then QAT fine-tune with the
recipe modified by ``modify_params_for_qat``).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="PTQ + QAT from a YAML recipe")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from super_gradients_tpu import init_trainer, setup_device
    from super_gradients_tpu.common.config import load_recipe
    from super_gradients_tpu.training.qat_trainer import QATTrainer

    init_trainer()
    cfg = load_recipe(args.config_name, config_dir=args.config_dir, overrides=args.overrides)
    setup_device(num_devices=cfg.get("num_devices"))
    result = QATTrainer.quantize_from_config(cfg)
    print("QAT/PTQ complete.")
    return result


if __name__ == "__main__":
    main()
