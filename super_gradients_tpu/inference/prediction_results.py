"""Prediction result objects (reference ``training/utils/predict/*``:
DetectionPrediction, ImagePrediction/ImagesPredictions with .show()/.save()/.draw()).

Drawing uses PIL (no cv2 in this environment).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np


_PALETTE = [
    (255, 56, 56), (255, 157, 151), (255, 112, 31), (255, 178, 29), (207, 210, 49),
    (72, 249, 10), (146, 204, 23), (61, 219, 134), (26, 147, 52), (0, 212, 187),
    (44, 153, 168), (0, 194, 255), (52, 69, 147), (100, 115, 255), (0, 24, 236),
    (132, 56, 255), (82, 0, 133), (203, 56, 255), (255, 149, 200), (255, 55, 199),
]


@dataclasses.dataclass
class DetectionPrediction:
    """Per-image detection result in original-image coordinates."""

    bboxes_xyxy: np.ndarray  # [N, 4]
    confidence: np.ndarray  # [N]
    labels: np.ndarray  # [N] int
    class_names: Optional[List[str]] = None
    image: Optional[np.ndarray] = None  # HWC RGB uint8

    def __len__(self):
        return len(self.confidence)

    def draw(self, box_thickness: int = 2, show_confidence: bool = True) -> np.ndarray:
        from PIL import Image, ImageDraw

        img = Image.fromarray(self.image.copy())
        d = ImageDraw.Draw(img)
        for box, conf, label in zip(self.bboxes_xyxy, self.confidence, self.labels):
            color = _PALETTE[int(label) % len(_PALETTE)]
            d.rectangle([float(box[0]), float(box[1]), float(box[2]), float(box[3])], outline=color, width=box_thickness)
            name = self.class_names[int(label)] if self.class_names else str(int(label))
            text = f"{name} {conf:.2f}" if show_confidence else name
            d.text((float(box[0]) + 2, max(0.0, float(box[1]) - 12)), text, fill=color)
        return np.asarray(img)

    def save(self, output_path: str, **kwargs):
        from PIL import Image

        Image.fromarray(self.draw(**kwargs)).save(output_path)

    def show(self, **kwargs):  # no display in headless envs; kept for API parity
        return self.draw(**kwargs)


@dataclasses.dataclass
class ClassificationPrediction:
    confidence: np.ndarray  # [num_classes] or top-k
    labels: np.ndarray
    class_names: Optional[List[str]] = None
    image: Optional[np.ndarray] = None

    @property
    def prediction(self) -> int:
        return int(self.labels[0])


@dataclasses.dataclass
class SegmentationPrediction:
    segmentation_map: np.ndarray  # [H, W] int class ids
    class_names: Optional[List[str]] = None
    image: Optional[np.ndarray] = None

    def draw(self, alpha: float = 0.5) -> np.ndarray:
        overlay = np.zeros((*self.segmentation_map.shape, 3), dtype=np.uint8)
        for cls in np.unique(self.segmentation_map):
            overlay[self.segmentation_map == cls] = _PALETTE[int(cls) % len(_PALETTE)]
        base = self.image if self.image is not None else np.zeros_like(overlay)
        return (base * (1 - alpha) + overlay * alpha).astype(np.uint8)

    def save(self, output_path: str, **kwargs):
        from PIL import Image

        Image.fromarray(self.draw(**kwargs)).save(output_path)


@dataclasses.dataclass
class PoseEstimationPrediction:
    poses: np.ndarray  # [N, K, 3] x,y,conf
    scores: np.ndarray  # [N]
    bboxes_xyxy: Optional[np.ndarray] = None
    edge_links: Optional[Sequence] = None
    edge_colors: Optional[Sequence] = None  # per-link RGB (ref PoseVisualization)
    keypoint_colors: Optional[Sequence] = None  # per-joint RGB
    image: Optional[np.ndarray] = None

    def __len__(self):
        return len(self.scores)

    def draw(self, keypoint_radius: int = 3) -> np.ndarray:
        from PIL import Image, ImageDraw

        img = Image.fromarray(self.image.copy())
        d = ImageDraw.Draw(img)
        for pose_i, pose in enumerate(self.poses):
            color = _PALETTE[pose_i % len(_PALETTE)]
            if self.edge_links is not None:
                for link_i, (a, b) in enumerate(self.edge_links):
                    if pose[a, 2] > 0 and pose[b, 2] > 0:
                        ec = tuple(self.edge_colors[link_i]) if self.edge_colors is not None else color
                        d.line([tuple(pose[a, :2]), tuple(pose[b, :2])], fill=ec, width=2)
            for joint_i, (x, y, v) in enumerate(pose):
                if v > 0:
                    kc = tuple(self.keypoint_colors[joint_i]) if self.keypoint_colors is not None else color
                    d.ellipse([x - keypoint_radius, y - keypoint_radius, x + keypoint_radius, y + keypoint_radius], fill=kc)
        return np.asarray(img)

    def save(self, output_path: str, **kwargs):
        from PIL import Image

        Image.fromarray(self.draw(**kwargs)).save(output_path)


class ImagesPredictions:
    """Container over per-image predictions (reference ImagesPredictions)."""

    def __init__(self, predictions: List):
        self._images_prediction_lst = predictions

    def __len__(self):
        return len(self._images_prediction_lst)

    def __getitem__(self, i):
        return self._images_prediction_lst[i]

    def __iter__(self):
        return iter(self._images_prediction_lst)

    def save(self, output_folder: str, **kwargs):
        import os

        os.makedirs(output_folder, exist_ok=True)
        for i, p in enumerate(self._images_prediction_lst):
            p.save(os.path.join(output_folder, f"pred_{i}.jpg"), **kwargs)


class VideoPredictions(ImagesPredictions):
    """Per-frame predictions of a video (reference VideoPredictions): ``draw()``
    yields annotated frames; ``save(path.mp4|.gif)`` writes the rendered video."""

    def __init__(self, predictions: List, fps: int):
        super().__init__(predictions)
        self.fps = fps

    def draw(self, **kwargs):
        return [p.draw(**kwargs) for p in self._images_prediction_lst]

    def save(self, output_path: str, **kwargs):
        from super_gradients_tpu.inference.video import save_video

        save_video(output_path, self.draw(**kwargs), self.fps)
