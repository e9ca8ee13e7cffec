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
            # plot images (ref _analyze_class_distribution :486, _analyze_object_size_
            # distribution :507, sample grids :441)
            n_cls = len(all_classes) if all_classes else (max(class_counts) + 1 if class_counts else 0)
            if n_cls:
                img = self._class_distribution_plot(class_counts, n_cls, all_classes)
                if img is not None:
                    self.sg_logger.add_image(f"{title}/class_distribution", img)
            if widths:
                img = self._object_size_plot(np.asarray(widths), np.asarray(heights))
                if img is not None:
                    self.sg_logger.add_image(f"{title}/object_size_distribution", img)
            grid = self._sample_grid(loader)
            if grid is not None:
                self.sg_logger.add_image(f"{title}/sample_images", grid)
        logger.info(f"Dataset `{title}`: {stats['total_boxes']} boxes over {n_images} images, "
                    f"{stats['classes_present']} classes, {stats['boxes_per_image']:.1f} boxes/img")
        return stats

    # ------------------------------------------------------------------ plots
    # (ref datasets_utils.py:441-572 — matplotlib figures rendered to RGB arrays)

    @staticmethod
    def _fig_to_array(fig) -> np.ndarray:
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
        import matplotlib.pyplot as plt

        plt.close(fig)
        return buf

    def _class_distribution_plot(self, class_counts, num_classes: int, all_classes=None):
        """Bar chart of per-class instance counts (ref :486-505)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        hist = np.zeros(num_classes)
        for c, n in class_counts.items():
            if 0 <= c < num_classes:
                hist[c] = n
        fig = plt.figure(figsize=(10, 4), dpi=100)
        plt.bar(range(num_classes), hist, width=0.5, color="#0504aa", alpha=0.7)
        plt.xlim(-1, num_classes)
        plt.grid(axis="y", alpha=0.75)
        plt.xlabel("class"), plt.ylabel("instances"), plt.title("Class distribution")
        if all_classes and num_classes <= 30:
            plt.xticks(range(num_classes), all_classes, rotation=70, fontsize=7)
        return self._fig_to_array(fig)

    def _object_size_plot(self, widths: np.ndarray, heights: np.ndarray):
        """2D log-histogram of box width x height (ref :507-570)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        fig = plt.figure(figsize=(5, 5), dpi=100)
        hist, xe, ye = np.histogram2d(heights, widths, 50)
        plt.imshow(np.log(hist + 1), interpolation="nearest", origin="lower",
                   extent=[xe[0], xe[-1], ye[0], ye[-1]])
        plt.xlabel("width px"), plt.ylabel("height px"), plt.title("Object size distribution")
        return self._fig_to_array(fig)

    def _sample_grid(self, loader, max_images: int = 16):
        """Grid of sample images with gt boxes drawn (ref :430-441)."""
        try:
            batch = next(iter(loader))
        except StopIteration:
            return None
        images, targets = np.asarray(batch[0]), np.asarray(batch[1])
        if images.ndim != 4 or targets.ndim != 3:
            return None
        from PIL import Image, ImageDraw

        drawn = []
        for i in range(min(len(images), max_images)):
            arr = images[i]
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            im = Image.fromarray(arr)
            d = ImageDraw.Draw(im)
            for row in targets[i]:
                if row[0] >= 0:
                    d.rectangle(list(row[1:5]), outline=(255, 0, 0), width=2)
            drawn.append(np.asarray(im))
        n = len(drawn)
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
        h, w, c = drawn[0].shape
        grid = np.zeros((rows * h, cols * w, c), np.uint8)
        for i, im in enumerate(drawn):
            r, cc = divmod(i, cols)
            grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = im
        return grid
