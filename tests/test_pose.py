import jax
import jax.numpy as jnp
import numpy as np
import pytest

from super_gradients_tpu import models
from super_gradients_tpu.training import dataloaders
from super_gradients_tpu.training.losses.yolo_nas_pose_loss import YoloNASPoseLoss, batch_pose_oks
from super_gradients_tpu.training.metrics.pose_estimation import PoseEstimationMetrics, oks_matrix
from super_gradients_tpu.training.trainer import Trainer


def test_yolo_nas_pose_forward_shapes():
    model = models.get("yolo_nas_pose_n", image_size=64)
    out = model(jnp.ones((2, 64, 64, 3)))
    a = 64 + 16 + 4  # 8² + 4² + 2²
    assert out.pred_bboxes.shape == (2, a, 4)
    assert out.pred_scores.shape == (2, a, 1)
    assert out.pred_pose_coords.shape == (2, a, 17, 2)
    assert out.pred_pose_scores.shape == (2, a, 17)


def test_pose_oks_identity():
    rng = np.random.RandomState(0)
    kpts = rng.rand(1, 2, 17, 3).astype(np.float32) * 50
    kpts[..., 2] = 2  # all visible
    boxes = np.asarray([[[0, 0, 50, 50], [10, 10, 60, 60]]], np.float32)
    oks = np.asarray(batch_pose_oks(jnp.asarray(kpts), jnp.asarray(kpts[:, :, :, :2]), jnp.asarray(boxes),
                                    jnp.asarray(np.full(17, 0.05, np.float32))))
    # gt_i vs pred_i (same points) must give OKS 1
    assert oks[0, 0, 0] == pytest.approx(1.0, abs=1e-5)
    assert oks[0, 1, 1] == pytest.approx(1.0, abs=1e-5)


@pytest.mark.heavy  # compile-heavy; nightly tier
def test_pose_loss_finite_and_differentiable():
    model = models.get("yolo_nas_pose_n", image_size=64)
    loader = dataloaders.get("pose_test_dataloader", dataset_params={"image_size": (64, 64), "dataset_size": 4, "batch_size": 4})
    batch = next(iter(loader))
    loss = YoloNASPoseLoss(num_joints=17)

    def f(params):
        variables = {"params": params, "batch_stats": model.batch_stats}
        out = model.module.apply(variables, jnp.asarray(batch[0]), train=False)
        total, _ = loss(out, jnp.asarray(batch[1]))
        return total

    val, grads = jax.value_and_grad(f)(model.params)
    assert np.isfinite(float(val))
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


@pytest.mark.slow  # heavy e2e training — opt-in tier
def test_pose_training_e2e(tmp_path):
    """Driver config 4 analogue: YOLO-NAS-POSE keypoint training + pose NMS."""
    model = models.get("yolo_nas_pose_n", image_size=64)
    loader = dataloaders.get("pose_test_dataloader", dataset_params={"image_size": (64, 64), "dataset_size": 8, "batch_size": 8})
    trainer = Trainer("pose_e2e", ckpt_root_dir=str(tmp_path))
    params = dict(
        max_epochs=1,
        initial_lr=1e-4,
        loss="YoloNASPoseLoss",
        criterion_params={"num_joints": 17},
        valid_metrics_list=[{"PoseEstimationMetrics": {"num_joints": 17, "max_predictions": 8, "nms_mode": "fast"}}],
        metric_to_watch="AP",
        save_model=False,
        average_best_models=False,
    )
    trainer.train(model, params, loader, loader)
    assert np.isfinite(trainer.train_loss_history[0])
    assert "AP" in trainer.valid_metrics_history[0]


def test_pose_predict_surface():
    model = models.get("yolo_nas_pose_n", image_size=64)
    img = (np.random.RandomState(0).rand(80, 100, 3) * 255).astype(np.uint8)
    preds = model.predict(img, conf=0.0, max_predictions=5, pre_nms_max_predictions=64, nms_mode="fast", batch_size=1)
    p = preds[0]
    assert p.poses.shape[1:] == (17, 3)
    assert len(p) <= 5
    drawn = p.draw()
    assert drawn.shape == img.shape


def test_oks_metric_perfect():
    m = PoseEstimationMetrics(num_joints=4, oks_sigmas=[0.05] * 4, max_predictions=4)
    state = m.init()
    k = 4
    gt = np.full((1, 3, 5 + 3 * k), -1.0, np.float32)
    kp = np.asarray([[10, 10, 2], [20, 20, 2], [30, 30, 2], [40, 40, 2]], np.float32)
    gt[0, 0, 0] = 0
    gt[0, 0, 1:5] = [0, 0, 50, 50]
    gt[0, 0, 5:] = kp.reshape(-1)

    class FakeOut:
        poses = np.zeros((1, 4, k, 3), np.float32)
        boxes = np.zeros((1, 4, 4), np.float32)
        scores = np.zeros((1, 4), np.float32)
        num_detections = np.asarray([1])

    FakeOut.poses[0, 0] = kp
    FakeOut.scores[0, 0] = 0.9
    state = m.update(state, FakeOut, gt)
    res = m.compute(state)
    assert res["AP"] == pytest.approx(1.0, abs=1e-3)
