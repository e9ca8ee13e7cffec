"""CLI: render a recipe into a self-contained python training script
(ref ``src/super_gradients/convert_recipe_to_code.py``)."""

from __future__ import annotations

import argparse
import pprint


TEMPLATE = '''"""Auto-generated from recipe `{name}` by convert_recipe_to_code."""

import super_gradients_tpu as sg
from super_gradients_tpu.training import dataloaders

cfg = {cfg}

sg.init_trainer()
sg.setup_device()

model = sg.models.get(
    cfg["architecture"],
    num_classes=cfg.get("num_classes"),
    arch_params=cfg.get("arch_params"),
)
train_loader = dataloaders.get(
    cfg["train_dataloader"],
    dataset_params=cfg["dataset_params"].get("train_dataset_params"),
)
valid_loader = dataloaders.get(
    cfg["val_dataloader"],
    dataset_params=cfg["dataset_params"].get("val_dataset_params"),
)

trainer = sg.Trainer(experiment_name=cfg["experiment_name"], ckpt_root_dir=cfg.get("ckpt_root_dir"))
model = trainer.train(model, cfg["training_hyperparams"], train_loader, valid_loader)
print("best:", trainer.best_metric)
'''


def main(argv=None):
    parser = argparse.ArgumentParser(description="Render a recipe into a standalone script")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("--output", "-o", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from super_gradients_tpu.common.config import load_recipe

    cfg = load_recipe(args.config_name, config_dir=args.config_dir, overrides=args.overrides)
    code = TEMPLATE.format(name=args.config_name, cfg=pprint.pformat(cfg, indent=2, width=100))
    with open(args.output, "w") as f:
        f.write(code)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
