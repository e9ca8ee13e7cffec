"""CLI: resume the latest run of an experiment
(ref ``src/super_gradients/resume_experiment.py``)."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Resume an experiment")
    parser.add_argument("--experiment_name", required=True)
    parser.add_argument("--ckpt_root_dir", default=None)
    parser.add_argument("--config-name", required=True, help="the recipe the experiment was launched with")
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from super_gradients_tpu import init_trainer, setup_device
    from super_gradients_tpu.common.config import load_recipe
    from super_gradients_tpu.training.trainer import Trainer

    init_trainer()
    overrides = list(args.overrides) + ["training_hyperparams.resume=True"]
    cfg = load_recipe(args.config_name, config_dir=args.config_dir, overrides=overrides)
    cfg["experiment_name"] = args.experiment_name
    if args.ckpt_root_dir:
        cfg["ckpt_root_dir"] = args.ckpt_root_dir
    setup_device()
    return Trainer.train_from_config(cfg)


if __name__ == "__main__":
    main()
