"""Per-pretrained-model processing params (ref processing.py:914-1240
default_*_processing_params + get_pretrained_processing_params:1201)."""

import numpy as np
import pytest

from super_gradients_tpu.inference.processing import (
    ComposeProcessing,
    DetectionCenterPadding,
    DetectionLongestMaxSizeRescale,
    DetectionRescale,
    SegmentationPadShortToCropSize,
    SegmentationRescale,
    SegmentationResizeWithPadding,
    default_yolo_nas_coco_processing,
    get_pretrained_processing_params,
)


def test_yolo_nas_coco_geometry_matches_reference():
    """ADVICE r1: pretrained YOLO-NAS COCO = LongestMaxSizeRescale(636,636) +
    CenterPadding(640,640) (ref default_yolo_nas_coco_processing_params:960)."""
    proc = default_yolo_nas_coco_processing(640)
    kinds = [type(p).__name__ for p in proc.processings]
    assert kinds[:2] == ["DetectionLongestMaxSizeRescale", "DetectionCenterPadding"]
    assert proc.processings[0].output_shape == (636, 636)
    assert proc.processings[1].output_shape == (640, 640)
    img = np.random.randint(0, 255, (480, 320, 3), np.uint8)
    out, metas = proc.preprocess_image(img)
    assert out.shape == (640, 640, 3)
    # center padding: image occupies the middle, 114/255 at the borders
    # boxes round-trip: a box at a known image location maps back exactly
    boxes = np.array([[100.0, 50.0, 200.0, 150.0]], np.float32)
    fwd_scale = min(636 / 480, 636 / 320)
    pad_left = (640 - round(320 * fwd_scale)) // 2
    pad_top = (640 - round(480 * fwd_scale)) // 2
    boxes_in_model = boxes * fwd_scale + np.array([pad_left, pad_top, pad_left, pad_top])
    back = proc.postprocess_boxes(boxes_in_model, metas)
    np.testing.assert_allclose(back, boxes, atol=1e-4)


def test_detection_rescale_per_axis_round_trip():
    op = DetectionRescale((640, 640))
    img = np.zeros((480, 320, 3), np.uint8)
    out, meta = op.preprocess_image(img)
    assert out.shape == (640, 640, 3)
    boxes = np.array([[64.0, 96.0, 320.0, 480.0]], np.float32)  # model space
    back = op.postprocess_boxes(boxes, meta)
    np.testing.assert_allclose(back, [[64 / 2.0, 96 / (640 / 480), 320 / 2.0, 480 / (640 / 480)]], atol=1e-4)
    kpts = np.array([[[64.0, 96.0, 1.0]]], np.float32)
    kback = op.postprocess_keypoints(kpts, meta)
    np.testing.assert_allclose(kback[0, 0, :2], [32.0, 72.0], atol=1e-4)


def test_segmentation_resize_with_padding_round_trip():
    op = SegmentationResizeWithPadding((512, 1024), pad_value=0)
    img = np.random.randint(0, 255, (400, 600, 3), np.uint8)
    out, meta = op.preprocess_image(img)
    assert out.shape == (512, 1024, 3)
    seg = np.random.randint(0, 19, (512, 1024), np.uint8)
    back = op.postprocess_segmentation(seg, meta)
    assert back.shape == (400, 600)


def test_segmentation_rescale_pad_short_pipeline():
    pipe = ComposeProcessing([SegmentationRescale(long_size=256), SegmentationPadShortToCropSize((256, 512), 0)])
    img = np.random.randint(0, 255, (200, 300, 3), np.uint8)
    out, metas = pipe.preprocess_image(img)
    assert out.shape[0] == 256 and out.shape[1] == 512
    seg = np.zeros(out.shape[:2], np.uint8)
    back = pipe.postprocess_segmentation(seg, metas)
    assert back.shape == (200, 300)


@pytest.mark.parametrize(
    "model,weights,expect_kind",
    [
        ("yolox_s", "coco", "DetectionLongestMaxSizeRescale"),
        ("ppyoloe_m", "coco", "DetectionRescale"),
        ("yolo_nas_l", "coco", "DetectionLongestMaxSizeRescale"),
        ("dekr_w32_no_dc", "coco_pose", "KeypointsLongestMaxSizeRescale"),
        ("yolo_nas_pose_s", "coco_pose", "KeypointsLongestMaxSizeRescale"),
        ("resnet50", "imagenet", "Resize"),
        ("vit_base", "imagenet", "Resize"),
        ("ddrnet_23", "cityscapes", "SegmentationResizeWithPadding"),
        ("stdc1_seg75", "cityscapes", "SegmentationResizeWithPadding"),
        ("segformer_b0", "cityscapes", "SegmentationRescale"),
    ],
)
def test_get_pretrained_processing_params_routing(model, weights, expect_kind):
    params = get_pretrained_processing_params(model, weights)
    assert params, f"no params for {model}/{weights}"
    kinds = [type(p).__name__ for p in params["image_processor"].processings]
    assert expect_kind in kinds, kinds


def test_pretrained_params_conf_iou_values():
    assert get_pretrained_processing_params("yolox_s", "coco")["iou"] == 0.65
    assert get_pretrained_processing_params("yolox_s", "coco")["conf"] == 0.1
    assert get_pretrained_processing_params("ppyoloe_s", "coco")["conf"] == 0.5
    p = get_pretrained_processing_params("yolo_nas_m", "coco")
    assert p["iou"] == 0.7 and p["conf"] == 0.25
    pose = get_pretrained_processing_params("yolo_nas_pose_l", "coco_pose")
    assert pose["conf"] == 0.5 and len(pose["edge_links"]) == 19 and len(pose["keypoint_colors"]) == 17


def test_seg75_scale():
    p = get_pretrained_processing_params("stdc1_seg75", "cityscapes")
    op = p["image_processor"].processings[0]
    assert op.output_shape == (768, 1536)


def test_unknown_returns_empty():
    assert get_pretrained_processing_params("resnet50", "coco") == {}


def test_photometric_equivalent_fn_matches_host_pipeline():
    """get_equivalent_photometric_fn (ref processing.py:87) — the composed in-graph
    preprocessing equals the host pipeline's photometric effect."""
    import jax.numpy as jnp

    from super_gradients_tpu.inference.processing import (
        NormalizeImage,
        ReverseImageChannels,
        StandardizeImage,
    )

    pipe = ComposeProcessing(
        [
            ReverseImageChannels(),
            DetectionRescale((32, 32)),  # geometric: identity in the photometric fn
            NormalizeImage(mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375]),
            StandardizeImage(255.0),
        ]
    )
    fn = pipe.get_equivalent_photometric_fn()
    assert fn is not None
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3)).astype(np.float32)
    # host path without the geometric op
    host = img[..., ::-1]
    host = (host - np.array([123.675, 116.28, 103.53], np.float32)) / np.array([58.395, 57.12, 57.375], np.float32)
    host = host / 255.0
    got = np.asarray(fn(jnp.asarray(img)))
    np.testing.assert_allclose(got, host, rtol=1e-5, atol=1e-5)


def test_geometric_only_pipeline_has_no_photometric_fn():
    pipe = ComposeProcessing([DetectionLongestMaxSizeRescale((64, 64)), DetectionCenterPadding((64, 64))])
    assert pipe.get_equivalent_photometric_fn() is None
