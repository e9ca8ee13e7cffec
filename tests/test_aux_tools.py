"""Aux-subsystem depth: dataset statistics plots, dataset RAM cache + plot(),
score-threshold finder script, export_recipe script (VERDICT r1 missing #9, aux)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from super_gradients_tpu.training.dataloaders import DataLoader, RandomDetectionDataset


class _Sink:
    def __init__(self):
        self.scalars, self.images, self.texts = {}, {}, {}

    def add_scalar(self, tag, value, step=0):
        self.scalars[tag] = value

    def add_image(self, tag, image, step=0):
        self.images[tag] = image

    def add_text(self, tag, text, step=0):
        self.texts[tag] = text


def test_dataset_statistics_writes_plots():
    from super_gradients_tpu.training.dataset_statistics import DatasetStatisticsLogger

    sink = _Sink()
    loader = DataLoader(RandomDetectionDataset(num_samples=8, image_size=(32, 32), num_classes=5), batch_size=4)
    stats = DatasetStatisticsLogger(sink).analyze(loader, title="train", all_classes=[f"c{i}" for i in range(5)])
    assert stats["images_analyzed"] > 0
    assert "train/class_distribution" in sink.images
    assert "train/object_size_distribution" in sink.images
    assert "train/sample_images" in sink.images
    grid = sink.images["train/sample_images"]
    assert grid.ndim == 3 and grid.dtype == np.uint8


def test_detection_dataset_ram_cache_and_plot(tmp_path):
    from super_gradients_tpu.training.datasets import COCOFormatDetectionDataset

    os.makedirs(tmp_path / "images")
    for i in range(2):
        Image.fromarray(np.full((24, 24, 3), 50 * i, np.uint8)).save(tmp_path / "images" / f"im{i}.jpg")
    coco = {
        "images": [{"id": i + 1, "file_name": f"im{i}.jpg", "height": 24, "width": 24} for i in range(2)],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [2, 2, 10, 10], "iscrowd": 0, "area": 100},
            {"id": 2, "image_id": 2, "category_id": 1, "bbox": [5, 5, 8, 8], "iscrowd": 0, "area": 64},
        ],
        "categories": [{"id": 1, "name": "thing"}],
    }
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(coco, f)

    ds = COCOFormatDetectionDataset(data_dir=str(tmp_path), json_annotation_file="ann.json",
                                    images_dir="images", cache_images=True)
    _ = ds[0]
    assert len(ds._image_cache) == 1  # first image decoded once
    _ = ds[0]
    assert len(ds._image_cache) == 1
    grid = ds.plot(max_samples_per_plot=2)
    assert grid is not None and grid.ndim == 3


def test_best_score_thresholds_per_class():
    from super_gradients_tpu.training.metrics.detection import best_score_thresholds

    # class 0: two TPs + one low-conf FP (best F1 needs a threshold above the FP);
    # class 1: all TPs (best F1 already at threshold 0 — the reference's argmax
    # picks the FIRST maximum of the 101-point sweep, detection_utils.py:1558)
    tp = np.array([[1], [1], [0], [1], [1]], dtype=float)
    conf = np.array([0.9, 0.85, 0.2, 0.3, 0.25])
    cls = np.array([0, 0, 0, 1, 1])
    n_gt = np.array([2, 2])
    g_thr, g_f1, per_cls = best_score_thresholds(tp, conf, cls, n_gt)
    assert set(per_cls) == {0, 1}
    assert per_cls[0] > per_cls[1]
    assert 0.0 <= g_thr <= 1.0 and g_f1 > 0.9


def test_export_recipe_script(tmp_path):
    from super_gradients_tpu.scripts.export_recipe import export_recipe

    out = export_recipe("cifar10_resnet", save_path=str(tmp_path / "full.yaml"))
    import yaml

    with open(out) as f:
        cfg = yaml.safe_load(f)
    assert "architecture" in cfg and "training_hyperparams" in cfg


def test_find_detection_score_threshold_script(tmp_path, monkeypatch):
    monkeypatch.setenv("SG_CKPT_ROOT", str(tmp_path))
    from super_gradients_tpu.scripts.find_detection_score_threshold import find_detection_score_threshold

    thresholds = find_detection_score_threshold(
        "coco2017_yolo_nas_s",
        overrides=[
            "val_dataloader=detection_test_dataloader",
            f"ckpt_root_dir={tmp_path}",
            "arch_params.image_size=64",
            "num_classes=5",
            "dataset_params.val_dataset_params.batch_size=8",
        ],
    )
    assert any("Best_score_threshold" in k for k in thresholds)
