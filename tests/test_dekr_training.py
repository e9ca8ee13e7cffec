
"""DEKR training path: dense target generation, end-to-end train step, rescoring data
(VERDICT r1 #8; ref target_generators.py:1-226, rescoring_dataset.py)."""

import numpy as np
import pytest

from super_gradients_tpu.training.pose_targets import (
    DEKRTargetsGenerator,
    TARGET_GENERATORS,
    padded_pose_targets_to_joints,
)



# Heavy e2e training file — opt-in tier (pytest -m slow); the default tier keeps
# the per-component unit/golden tests (see pytest.ini).
pytestmark = pytest.mark.slow

def _one_pose(k=17, x0=100.0, y0=80.0, spread=40.0):
    joints = np.zeros((1, k, 3), np.float32)
    rng = np.random.RandomState(0)
    joints[0, :, 0] = x0 + rng.uniform(-spread, spread, k)
    joints[0, :, 1] = y0 + rng.uniform(-spread, spread, k)
    joints[0, :, 2] = 2.0
    return joints


def test_generator_shapes_and_layout():
    g = DEKRTargetsGenerator(output_stride=4, sigma=2.0, center_sigma=4.0, bg_weight=0.1, offset_radius=4)
    joints = _one_pose()
    hm, mask, off, ow = g((256, 256), joints)
    assert hm.shape == (64, 64, 18)  # center + 17 joints, NHWC
    assert mask.shape == (64, 64, 18)
    assert off.shape == (64, 64, 34)
    assert ow.shape == (64, 64, 34)


def test_heatmap_peak_is_one_at_joint():
    g = DEKRTargetsGenerator(output_stride=4, sigma=2.0, center_sigma=4.0, bg_weight=0.1, offset_radius=4)
    joints = np.zeros((1, 2, 3), np.float32)
    joints[0, 0] = [100.0, 80.0, 2.0]   # -> output grid (25, 20)
    joints[0, 1] = [40.0, 160.0, 2.0]   # -> (10, 40)
    hm, mask, off, ow = g((256, 256), joints)
    # channel 0 is the CENTER heatmap; joints at channels 1, 2
    assert hm[20, 25, 1] == 1.0
    assert hm[40, 10, 2] == 1.0
    # gaussian decays away from the peak
    assert 0 < hm[20, 29, 1] < 1.0
    # center channel has a 1.0 peak at the mean of the two joints -> ((25+10)/2, (20+40)/2)
    cy, cx = np.unravel_index(np.argmax(hm[..., 0]), hm[..., 0].shape)
    assert abs(cx - 17) <= 1 and abs(cy - 30) <= 1


def test_mask_bg_weight_and_ignore_regions():
    g = DEKRTargetsGenerator(output_stride=4, sigma=2.0, center_sigma=4.0, bg_weight=0.1, offset_radius=4)
    joints = np.zeros((1, 1, 3), np.float32)
    joints[0, 0] = [128.0, 128.0, 2.0]
    hm, mask, off, ow = g((256, 256), joints)
    # background far from any joint gets bg_weight
    assert mask[0, 0, 1] == pytest.approx(0.1)
    # inside the gaussian window the weight is 1.0
    assert mask[32, 32, 1] == pytest.approx(1.0)
    # crowd-masked area zeroes the loss weight entirely
    crowd_mask = np.ones((256, 256), np.float32)
    crowd_mask[:64, :64] = 0.0
    hm2, mask2, _, _ = g((256, 256), joints, crowd_mask)
    assert mask2[:15, :15].max() == 0.0


def test_offsets_point_from_center_window_to_joints():
    g = DEKRTargetsGenerator(output_stride=4, sigma=2.0, center_sigma=4.0, bg_weight=0.1, offset_radius=4)
    joints = np.zeros((1, 2, 3), np.float32)
    joints[0, 0] = [100.0, 80.0, 2.0]
    joints[0, 1] = [120.0, 100.0, 2.0]
    hm, mask, off, ow = g((256, 256), joints)
    # center in output grid = mean of joints / stride = ((25+30)/2, (20+25)/2) = (27.5, 22.5)
    ct_x, ct_y = 27, 22
    # at the center pixel, offset for joint 0 = ct - joint0 = (27-25, 22-20)
    assert off[ct_y, ct_x, 0] == pytest.approx(ct_x - 25.0)
    assert off[ct_y, ct_x, 1] == pytest.approx(ct_y - 20.0)
    assert ow[ct_y, ct_x, 0] > 0
    # outside the offset window: zero weight
    assert ow[0, 0, 0] == 0.0


def test_registered_in_target_generator_registry():
    assert "DEKRTargetsGenerator" in TARGET_GENERATORS


def test_padded_roundtrip():
    t = np.full((4, 5 + 6), -1.0, np.float32)
    t[0, 0] = 1.0
    t[0, 1:5] = [1, 2, 3, 4]
    t[0, 5:] = np.arange(6)
    joints, boxes = padded_pose_targets_to_joints(t, 2)
    assert joints.shape == (1, 2, 3)
    assert boxes.shape == (1, 4)


def test_dekr_one_epoch_loss_decreases(tmp_path):
    """VERDICT done-criterion: 1-epoch DEKR train runs on fake pose data and loss
    decreases."""
    from super_gradients_tpu import models
    from super_gradients_tpu.training.dataloaders import get as get_loader
    from super_gradients_tpu.training.trainer import Trainer

    model = models.get("dekr_w32_no_dc", image_size=64, arch_params={"width": 8})
    loader = get_loader("dekr_test_dataloader", dataloader_params={"batch_size": 4, "image_size": (64, 64), "dataset_size": 8})
    trainer = Trainer(experiment_name="dekr_smoke", ckpt_root_dir=str(tmp_path))
    trainer.train(
        model=model,
        training_params={
            "max_epochs": 3,
            "lr_mode": "cosine",
            "initial_lr": 1e-3,
            "loss": "DEKRLoss",
            "optimizer": "adam",
            "metric_to_watch": "train_loss",
            "greater_metric_to_watch_is_better": False,
            "average_best_models": False,
            "ema": False,
        },
        train_loader=loader,
    )
    hist = trainer.train_loss_history
    assert len(hist) == 3
    assert hist[-1] < hist[0], hist


def test_rescoring_data_generation_and_dataset(tmp_path):
    from super_gradients_tpu import models
    from super_gradients_tpu.training.dataloaders import get as get_loader
    from super_gradients_tpu.training.datasets_rescoring import (
        TrainRescoringDataset,
        ValTrainRescoringDataset,
        generate_rescoring_data,
    )

    model = models.get("dekr_w32_no_dc", image_size=64, arch_params={"width": 8})
    loader = get_loader("pose_test_dataloader", dataloader_params={"batch_size": 4, "image_size": (64, 64), "dataset_size": 4})
    out = generate_rescoring_data(model, loader, str(tmp_path / "rescoring.pkl"), conf=0.0, max_batches=1)

    train_ds = TrainRescoringDataset(out)
    assert len(train_ds) > 0
    pose, target = train_ds[0]
    assert pose.shape[-1] == 3 and target.shape == (1,)

    val_ds = ValTrainRescoringDataset(out)
    poses, ious, extras = val_ds[0]
    assert poses.ndim == 3 and "gt_joints" in extras

    # rescoring net consumes these features end-to-end
    import jax
    import jax.numpy as jnp

    from super_gradients_tpu.inference.processing import COCO_POSE_DEFAULT_EDGE_LINKS
    from super_gradients_tpu.models.pose.rescoring_net import PoseRescoringNet

    net = PoseRescoringNet(num_classes=17, edge_links=tuple(map(tuple, COCO_POSE_DEFAULT_EDGE_LINKS)))
    batch = jnp.asarray(np.stack([train_ds[i][0] for i in range(min(4, len(train_ds)))]))
    variables = net.init(jax.random.PRNGKey(0), batch)
    poses_out, logits = net.apply(variables, batch)
    assert logits.shape[0] == batch.shape[0]
