"""CLI: ``python -m super_gradients_tpu.evaluate_checkpoint --experiment_name=<name> [--ckpt_name=ckpt_best]``

Reference parity: ``src/super_gradients/evaluate_checkpoint.py`` →
``Trainer.evaluate_checkpoint`` (sg_trainer.py:407): reload a previous run's
persisted recipe, rebuild the model + val loader, load the named checkpoint, and
run validation.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a saved checkpoint of a previous experiment")
    parser.add_argument("--experiment_name", "--experiment-name", dest="experiment_name", required=True)
    parser.add_argument("--ckpt_root_dir", "--ckpt-root-dir", dest="ckpt_root_dir", default=None)
    parser.add_argument("--ckpt_name", "--ckpt-name", dest="ckpt_name", default="ckpt_best")
    parser.add_argument("--run_id", "--run-id", dest="run_id", default=None)
    args = parser.parse_args(argv)

    from super_gradients_tpu import init_trainer, setup_device
    from super_gradients_tpu.training.trainer import Trainer

    init_trainer()
    setup_device()
    results = Trainer.evaluate_checkpoint(
        experiment_name=args.experiment_name,
        ckpt_root_dir=args.ckpt_root_dir,
        ckpt_name=args.ckpt_name,
        run_id=args.run_id,
    )
    print({k: round(float(v), 5) for k, v in results.items()})
    return results


if __name__ == "__main__":
    main()
