"""Pose rescoring network (reference ``pose_estimation_models/rescoring_net.py``).

An MLP that predicts a score multiplier per pose from skeleton-geometry features:
normalized joint-link deltas, link lengths, and per-joint visibility
(rescoring_net.py:16-88). Trained with :class:`RescoringLoss` against target OKS.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def rescoring_features(poses: jnp.ndarray, edge_links) -> jnp.ndarray:
    """[..., J, 3] poses → [..., L*2 + L + J] features (ref get_feature:59-88).

    Link deltas and lengths are normalized by the mean of links 9 and 11 (the
    COCO torso links in the reference's DEKR edge ordering), clamped to ≥1.
    """
    links = jnp.asarray(edge_links, jnp.int32)  # [L, 2]
    joint_xy = poses[..., :2]
    visibility = poses[..., 2]
    j1, j2 = links[:, 0], links[:, 1]
    joint_relate = jnp.take(joint_xy, j1, axis=-2) - jnp.take(joint_xy, j2, axis=-2)  # [..., L, 2]
    joint_length = jnp.sqrt((joint_relate**2).sum(-1) + 1e-12)  # [..., L]
    normalize = jnp.maximum((joint_length[..., 9] + joint_length[..., 11]) / 2.0, 1.0)
    joint_length = joint_length / normalize[..., None]
    joint_relate = joint_relate / normalize[..., None, None]
    flat = joint_relate.reshape(*joint_relate.shape[:-2], -1)  # [..., L*2]
    return jnp.concatenate([flat, joint_length, visibility], axis=-1)


class PoseRescoringNet(nn.Module):
    """3-layer MLP over skeleton features → scalar logit (ref rescoring_net.py:16-56).

    ``__call__`` returns ``(poses, score_logits)`` so :class:`RescoringLoss` can
    consume the tuple directly.
    """

    num_classes: int = 17  # joints
    hidden_channels: int = 256
    num_layers: int = 3
    edge_links: Tuple[Tuple[int, int], ...] = ()

    @nn.compact
    def __call__(self, poses: jnp.ndarray, train: bool = False):
        x = rescoring_features(poses, self.edge_links)
        for i in range(self.num_layers):
            x = nn.relu(nn.Dense(self.hidden_channels, name=f"layers_{i}")(x))
        y = nn.Dense(1, name="final")(x)
        return poses, y
