"""DEKR dense target generation (host-side data pipeline).

Reference parity: ``datasets/pose_estimation_datasets/target_generators.py:1-226``
(DEKRTargetsGenerator) — gaussian keypoint/center heatmaps, ignore-region weighting,
and center-window offset fields.

TPU-native redesign:
- NHWC layout (``[H', W', C]``) to match the flax DEKR model's outputs; the CENTER
  heatmap is channel 0 (the reference puts it last) — ``DEKROutputs.heatmaps[..., 0]``
  is the center branch, so generator and model agree by construction.
- per-window math is vectorized numpy (no per-pixel python loops); windows follow the
  reference's exact box/peak arithmetic so heatmap values match the torch pipeline.
- instances with zero visible joints are filtered (the reference raises).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from super_gradients_tpu.common.registry import create_register_decorator

TARGET_GENERATORS: dict = {}
register_target_generator = create_register_decorator(TARGET_GENERATORS)


class KeypointsTargetsGenerator:
    """ABC (ref target_generators.py:13): (image_hw, joints, mask) -> target tensors."""

    def __call__(self, image_hw: Tuple[int, int], joints: np.ndarray, mask: np.ndarray):
        raise NotImplementedError


@register_target_generator("DEKRTargetsGenerator")
class DEKRTargetsGenerator(KeypointsTargetsGenerator):
    """ref target_generators.py:29-226.

    Returns ``(heatmaps [H',W',1+K], heatmap_mask [H',W',1+K], offsets [H',W',2K],
    offset_weights [H',W',2K])`` with H' = H // output_stride. Channel 0 of the
    heatmaps/mask is the instance center.
    """

    def __init__(
        self,
        output_stride: int = 4,
        sigma: float = 2.0,
        center_sigma: float = 4.0,
        bg_weight: float = 0.1,
        offset_radius: float = 4.0,
    ):
        self.output_stride = int(output_stride)
        self.sigma = float(sigma)
        self.center_sigma = float(center_sigma)
        self.bg_weight = float(bg_weight)
        self.offset_radius = float(offset_radius)

    @staticmethod
    def compute_area(joints: np.ndarray) -> np.ndarray:
        w = np.max(joints[:, :, 0], axis=-1) - np.min(joints[:, :, 0], axis=-1)
        h = np.max(joints[:, :, 1], axis=-1) - np.min(joints[:, :, 1], axis=-1)
        return w * h

    @staticmethod
    def augment_with_center(joints: np.ndarray) -> np.ndarray:
        """[N,K,3] -> [N,K+1,3]; appended center = mean of visible joints."""
        vis = (joints[:, :, 2] > 0).astype(np.float32)  # [N,K]
        n_vis = np.maximum(vis.sum(-1, keepdims=True), 1.0)
        center_xy = (joints[:, :, :2] * vis[..., None]).sum(1) / n_vis  # [N,2]
        center = np.concatenate([center_xy, np.ones((len(joints), 1), np.float32)], axis=-1)
        return np.concatenate([joints, center[:, None, :]], axis=1).astype(np.float32)

    def _splat(self, heat, ignored, ch, x, y, sigma, oh, ow):
        """Reference window arithmetic (target_generators.py:160-186), vectorized."""
        ix, iy = int(x), int(y)
        ul = int(np.floor(x - 3 * sigma - 1)), int(np.floor(y - 3 * sigma - 1))
        br = int(np.ceil(x + 3 * sigma + 1)), int(np.ceil(y + 3 * sigma + 1))
        aa, bb = max(0, ul[1]), min(br[1], oh)
        cc, dd = max(0, ul[0]), min(br[0], ow)
        if bb <= aa or dd <= cc:
            return
        ys, xs = np.mgrid[aa:bb, cc:dd]
        g = np.exp(-((xs - ix) ** 2 + (ys - iy) ** 2) / (2 * sigma**2)).astype(np.float32)
        # exact 1.0 at the window-center pixel (RFL loss needs a true-positive peak)
        g[(bb - aa) // 2, (dd - cc) // 2] = 1.0
        heat[aa:bb, cc:dd, ch] = np.maximum(heat[aa:bb, cc:dd, ch], g)
        ignored[aa:bb, cc:dd, ch] = 1.0

    def __call__(self, image_hw: Tuple[int, int], joints: np.ndarray, mask: np.ndarray = None):
        rows, cols = int(image_hw[0]), int(image_hw[1])
        if rows % self.output_stride or cols % self.output_stride:
            raise ValueError(f"Image shape {image_hw} must be divisible by output stride {self.output_stride}")
        if mask is None:
            mask = np.ones((rows, cols), np.float32)
        if mask.shape[:2] != (rows, cols):
            raise ValueError(f"Image and mask shapes differ: {image_hw} vs {mask.shape[:2]}")

        joints = np.asarray(joints, np.float32).reshape(-1, joints.shape[-2], 3)
        # drop padded / fully-invisible instances (ref raises; datasets pad with -1)
        joints = joints[(joints[:, :, 2] > 0).any(-1)]
        num_joints = joints.shape[1]
        oh, ow = rows // self.output_stride, cols // self.output_stride

        heatmaps = np.zeros((oh, ow, 1 + num_joints), np.float32)
        ignored = np.full((oh, ow, 1 + num_joints), 2.0, np.float32)
        offset_map = np.zeros((oh, ow, num_joints * 2), np.float32)
        offset_weight = np.zeros((oh, ow, num_joints * 2), np.float32)

        if len(joints):
            area = self.compute_area(joints)
            order = np.argsort(-area)
            joints, area = joints[order], area[order]
            joints = self.augment_with_center(joints)  # [N, K+1, 3]; center LAST here
            joints = joints.copy()
            joints[:, :, 0] *= ow / cols
            joints[:, :, 1] *= oh / rows

            for p in joints:
                for idx, pt in enumerate(p):
                    is_center = idx == num_joints
                    sigma = self.center_sigma if is_center else self.sigma
                    ch = 0 if is_center else idx + 1  # center-first channel layout
                    if pt[2] > 0:
                        x, y = float(pt[0]), float(pt[1])
                        if x < 0 or y < 0 or x >= ow or y >= oh:
                            continue
                        self._splat(heatmaps, ignored, ch, x, y, sigma, oh, ow)

            # offsets: larger instances first, later (smaller) instances overwrite
            # (ref target_generators.py:188-219)
            r = self.offset_radius
            for person_id, p in enumerate(joints):
                w_factor = 1.0 / max(np.sqrt(max(area[person_id], 0.0)), 1.0)
                ct_x, ct_y, ct_v = int(p[-1, 0]), int(p[-1, 1]), int(p[-1, 2])
                if ct_v < 1 or ct_x < 0 or ct_y < 0 or ct_x >= ow or ct_y >= oh:
                    continue
                sx, ex = max(int(ct_x - r), 0), min(int(ct_x + r), ow)
                sy, ey = max(int(ct_y - r), 0), min(int(ct_y + r), oh)
                if ex <= sx or ey <= sy:
                    continue
                ys, xs = np.mgrid[sy:ey, sx:ex]
                for idx in range(num_joints):
                    pt = p[idx]
                    if pt[2] > 0:
                        x, y = float(pt[0]), float(pt[1])
                        if x < 0 or y < 0 or x >= ow or y >= oh:
                            continue
                        offset_map[sy:ey, sx:ex, idx * 2] = xs - x
                        offset_map[sy:ey, sx:ex, idx * 2 + 1] = ys - y
                        offset_weight[sy:ey, sx:ex, idx * 2] = w_factor
                        offset_weight[sy:ey, sx:ex, idx * 2 + 1] = w_factor

        ignored[ignored == 2.0] = self.bg_weight

        if mask.shape != (oh, ow):
            try:
                import cv2

                m = cv2.resize(mask.astype(np.float32), dsize=(ow, oh), interpolation=cv2.INTER_LINEAR)
            except ImportError:
                from PIL import Image

                m = np.asarray(Image.fromarray((mask * 255).astype(np.uint8)).resize((ow, oh), Image.BILINEAR), np.float32) / 255.0
        else:
            m = mask.astype(np.float32)
        m = (m > 0).astype(np.float32)
        hm_mask = m[..., None] * ignored

        return heatmaps, hm_mask, offset_map, offset_weight


def padded_pose_targets_to_joints(targets: np.ndarray, num_joints: int) -> Tuple[np.ndarray, np.ndarray]:
    """Decode the library's padded ``[max_poses, 5 + 3K]`` rows (valid, box_xyxy,
    K*(x,y,v)) into ``joints [N, K, 3]`` (dropping padding)."""
    t = np.asarray(targets, np.float32)
    valid = t[:, 0] > 0
    joints = t[valid, 5 : 5 + 3 * num_joints].reshape(-1, num_joints, 3)
    return joints, t[valid, 1:5]
