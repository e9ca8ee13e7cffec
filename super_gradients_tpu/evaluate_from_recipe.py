"""CLI: evaluate a recipe's model on its validation set
(ref ``src/super_gradients/evaluate_from_recipe.py`` -> Trainer.evaluate_from_config)."""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate from a YAML recipe")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("--checkpoint-path", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from super_gradients_tpu import init_trainer, models, setup_device
    from super_gradients_tpu.common.config import load_recipe
    from super_gradients_tpu.training import dataloaders
    from super_gradients_tpu.training.trainer import Trainer

    init_trainer()
    cfg = load_recipe(args.config_name, config_dir=args.config_dir, overrides=args.overrides)
    setup_device()
    model = models.get(
        cfg["architecture"],
        num_classes=cfg.get("num_classes"),
        arch_params=cfg.get("arch_params"),
        checkpoint_path=args.checkpoint_path or (cfg.get("checkpoint_params") or {}).get("checkpoint_path"),
    )
    valid_loader = dataloaders.get(
        cfg.get("val_dataloader"),
        dataset_params=(cfg.get("dataset_params") or {}).get("val_dataset_params"),
    )
    trainer = Trainer(cfg.get("experiment_name", "evaluation"), ckpt_root_dir=cfg.get("ckpt_root_dir"))
    tp = dict(cfg.get("training_hyperparams") or {})
    tp.update(max_epochs=0)
    results = trainer.evaluate(model, valid_loader, tp)
    print("Evaluation results:", results)
    return results


if __name__ == "__main__":
    main()
