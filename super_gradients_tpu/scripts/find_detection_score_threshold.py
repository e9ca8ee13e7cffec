"""Find the best per-class confidence thresholds for a trained detection model.

Reference parity: ``scripts/find_detection_score_threshold.py`` — evaluate a recipe's
model on its validation set with best-score-threshold search enabled and report the
global + per-class F1-optimal thresholds (to be reused as NMS score thresholds).

Usage:
    python -m super_gradients_tpu.scripts.find_detection_score_threshold \
        --config-name=coco2017_yolo_nas_s [--checkpoint-path=...] [overrides...]
"""

from __future__ import annotations

import argparse


def find_detection_score_threshold(config_name: str, config_dir: str = None, checkpoint_path: str = None, overrides=None):
    from super_gradients_tpu import init_trainer, models, setup_device
    from super_gradients_tpu.common.config import load_recipe
    from super_gradients_tpu.training import dataloaders
    from super_gradients_tpu.training.trainer import Trainer

    init_trainer()
    cfg = load_recipe(config_name, config_dir=config_dir, overrides=overrides or [])
    setup_device()
    model = models.get(
        cfg["architecture"],
        num_classes=cfg.get("num_classes"),
        arch_params=cfg.get("arch_params"),
        checkpoint_path=checkpoint_path or (cfg.get("checkpoint_params") or {}).get("checkpoint_path"),
    )
    valid_loader = dataloaders.get(
        cfg.get("val_dataloader"),
        dataset_params=(cfg.get("dataset_params") or {}).get("val_dataset_params"),
    )
    tp = dict(cfg.get("training_hyperparams") or {})
    tp.update(max_epochs=0)
    tp.pop("loss", None)  # threshold search needs metrics only (and the recipe loss
    # may be configured for a different class count than the evaluated model)
    # force threshold search + classwise reporting on every DetectionMetrics entry
    metrics = tp.get("valid_metrics_list") or ["DetectionMetrics"]
    forced = []
    for m in metrics:
        if isinstance(m, str) and "DetectionMetrics" in m:
            forced.append({m: {"calc_best_score_thresholds": True, "include_classwise_ap": True,
                               "num_cls": model.num_classes, "class_names": model.class_names}})
        elif isinstance(m, dict):
            name = next(iter(m))
            params = dict(m[name] or {})
            if "DetectionMetrics" in name:
                params.update(calc_best_score_thresholds=True, include_classwise_ap=True)
            forced.append({name: params})
        else:
            forced.append(m)
    tp["valid_metrics_list"] = forced

    trainer = Trainer(cfg.get("experiment_name", "score_threshold_search"), ckpt_root_dir=cfg.get("ckpt_root_dir"))
    results = trainer.evaluate(model, valid_loader, tp)
    thresholds = {k: v for k, v in results.items() if "Best_score_threshold" in k}
    print("Best score thresholds (global + per class):")
    for k, v in sorted(thresholds.items()):
        print(f"  {k}: {v:.2f}")
    return thresholds


def main(argv=None):
    parser = argparse.ArgumentParser(description="Per-class best detection score thresholds")
    parser.add_argument("--config-name", required=True)
    parser.add_argument("--config-dir", default=None)
    parser.add_argument("--checkpoint-path", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    return find_detection_score_threshold(args.config_name, args.config_dir, args.checkpoint_path, args.overrides)


if __name__ == "__main__":
    main()
