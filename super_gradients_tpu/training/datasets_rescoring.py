"""Pose rescoring datasets + rescoring-data generation.

Reference parity:
- ``datasets/pose_estimation_datasets/rescoring_dataset.py`` — TrainRescoringDataset
  (flat per-pose samples) and ValTrainRescoringDataset (per-image samples) over a
  pickled list of {pred_poses, pred_scores, iou, gt_*} dicts.
- ``scripts/generate_rescoring_data_dekr.py`` — run a pose model over a dataset and
  record, for every predicted pose, its best OKS against the image's ground truth;
  this is the training signal for :class:`PoseRescoringNet`.
"""

from __future__ import annotations

import pickle
from typing import Optional, Tuple

import numpy as np

from super_gradients_tpu.common.registry import register_dataloader
from super_gradients_tpu.training.dataloaders import DataLoader


def _parse_pkl(pkl_file_path: str):
    with open(pkl_file_path, "rb") as f:
        return pickle.load(f)


class TrainRescoringDataset:
    """Flat list of (pose [K,3], [target_oks]) pairs (ref rescoring_dataset.py:26-56)."""

    def __init__(self, pkl_file: str):
        self.pred_poses, self.iou = [], []
        for sample in _parse_pkl(pkl_file):
            self.pred_poses.extend(np.asarray(p, np.float32) for p in sample["pred_poses"])
            self.iou.extend(float(i) for i in sample["iou"])

    def __len__(self):
        return len(self.pred_poses)

    def __getitem__(self, index):
        return self.pred_poses[index], np.asarray([self.iou[index]], np.float32)


class ValTrainRescoringDataset:
    """Per-image samples (poses, target ious, gt extras) for post-rescoring metric
    computation; batch_size=1 (ref rescoring_dataset.py:59-102)."""

    def __init__(self, pkl_file: str):
        self.pred_poses, self.iou, self.extras = [], [], []
        for sample in _parse_pkl(pkl_file):
            self.pred_poses.append(np.asarray(sample["pred_poses"], np.float32))
            self.iou.append(np.asarray(sample["iou"], np.float32).reshape(-1, 1))
            self.extras.append(
                dict(
                    gt_joints=sample.get("gt_joints"),
                    gt_iscrowd=sample.get("gt_iscrowd"),
                    gt_bboxes=sample.get("gt_bboxes"),
                    gt_areas=sample.get("gt_areas"),
                )
            )
        self.num_joints = next((p.shape[1] for p in self.pred_poses if len(p)), 17)

    def __len__(self):
        return len(self.pred_poses)

    def __getitem__(self, index):
        return self.pred_poses[index].reshape(-1, self.num_joints, 3), self.iou[index], self.extras[index]


@register_dataloader("pose_rescoring_train")
def pose_rescoring_train(pkl_file: str, batch_size: int = 512, **kw) -> DataLoader:
    return DataLoader(TrainRescoringDataset(pkl_file), batch_size=batch_size, shuffle=True, drop_last=True)


def generate_rescoring_data(
    pose_model,
    dataloader,
    output_path: str,
    num_joints: int = 17,
    oks_sigmas: Optional[np.ndarray] = None,
    conf: float = 0.05,
    max_batches: Optional[int] = None,
) -> str:
    """Run ``pose_model.predict``-style decode over (image, padded-pose-target) batches
    and pickle per-image {pred_poses, pred_scores, iou} records
    (ref scripts/generate_rescoring_data_dekr.py)."""
    import jax.numpy as jnp

    from super_gradients_tpu.models.class_names import COCO_POSE_SIGMAS
    from super_gradients_tpu.training.metrics.pose_estimation import oks_matrix
    from super_gradients_tpu.training.pose_targets import padded_pose_targets_to_joints

    sigmas = np.asarray(oks_sigmas if oks_sigmas is not None else COCO_POSE_SIGMAS[:num_joints])
    records = []
    for bi, batch in enumerate(dataloader):
        if max_batches is not None and bi >= max_batches:
            break
        images, padded = batch[0], batch[1]
        if getattr(pose_model, "task", None) == "pose_estimation":
            preds = pose_model.predict_batch_tensor(jnp.asarray(images), conf=conf)
            poses = np.asarray(preds.poses)
            scores = np.asarray(preds.scores)
            nums = np.asarray(preds.num_detections)
        else:
            # DEKR path: heatmap model decoded via dekr_decode (ref dekr_decode callback)
            from super_gradients_tpu.models.pose.dekr import dekr_decode

            out = pose_model.module.apply(pose_model.variables, jnp.asarray(images), train=False)
            p, s = dekr_decode(out, center_threshold=conf)
            poses, scores = np.asarray(p), np.asarray(s)
            nums = (scores > 0).sum(-1)
        for j in range(len(images)):
            n = int(nums[j])
            pred_poses = poses[j, :n]
            gt_joints, gt_boxes = padded_pose_targets_to_joints(np.asarray(padded[j]), num_joints)
            if n and len(gt_joints):
                areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
                iou = oks_matrix(pred_poses, gt_joints, areas, sigmas).max(axis=1)
            else:
                iou = np.zeros((n,), np.float32)
            records.append(
                dict(
                    pred_poses=[p for p in pred_poses],
                    pred_scores=[s for s in scores[j, :n]],
                    iou=[float(v) for v in iou],
                    gt_joints=gt_joints,
                    gt_iscrowd=np.zeros((len(gt_joints),), bool),
                    gt_bboxes=gt_boxes,
                    gt_areas=(gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1]) if len(gt_joints) else np.zeros((0,)),
                )
            )
    with open(output_path, "wb") as f:
        pickle.dump(records, f)
    return output_path
