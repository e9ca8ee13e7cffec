"""Dataset statistics analyzer → logger images/scalars.

Reference: ``datasets/datasets_utils.py`` DatasetStatisticsTensorboardLogger
(~1000 LoC): class histograms, box size/aspect stats, sample grids written to
TensorBoard when ``training_params.dataset_statistics`` is set.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)


class DatasetStatisticsLogger:
    def __init__(self, sg_logger=None):
        self.sg_logger = sg_logger

    def analyze(self, loader, title: str = "dataset", max_batches: int = 16, all_classes: Optional[list] = None) -> Dict:
        """Detection loaders: per-class counts + box geometry stats."""
        class_counts: Dict[int, int] = {}
        widths, heights, aspects = [], [], []
        n_images = 0
        for bi, batch in enumerate(loader):
            if bi >= max_batches:
                break
            targets = np.asarray(batch[1])
            if targets.ndim != 3 or targets.shape[-1] < 5:
                continue  # not a detection loader
            n_images += targets.shape[0]
            valid = targets[..., 0] >= 0
            for cls in targets[..., 0][valid].astype(int):
                class_counts[cls] = class_counts.get(cls, 0) + 1
            boxes = targets[..., 1:5][valid]
            w = np.clip(boxes[:, 2] - boxes[:, 0], 0, None)
            h = np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
            widths += w.tolist()
            heights += h.tolist()
            aspects += (w / np.maximum(h, 1e-6)).tolist()
        stats = {
            "images_analyzed": n_images,
            "total_boxes": int(sum(class_counts.values())),
            "classes_present": len(class_counts),
            "class_counts": dict(sorted(class_counts.items())),
            "box_width_mean": float(np.mean(widths)) if widths else 0.0,
            "box_height_mean": float(np.mean(heights)) if heights else 0.0,
            "box_aspect_mean": float(np.mean(aspects)) if aspects else 0.0,
            "boxes_per_image": sum(class_counts.values()) / max(n_images, 1),
        }
        if self.sg_logger is not None:
            for k, v in stats.items():
                if isinstance(v, (int, float)):
                    self.sg_logger.add_scalar(f"{title}/{k}", float(v))
            self.sg_logger.add_text(f"{title}/class_counts", str(stats["class_counts"]))
        logger.info(f"Dataset `{title}`: {stats['total_boxes']} boxes over {n_images} images, "
                    f"{stats['classes_present']} classes, {stats['boxes_per_image']:.1f} boxes/img")
        return stats
