import json
import os

import numpy as np
import pytest
from PIL import Image

from super_gradients_tpu.training.datasets import (
    COCOFormatDetectionDataset,
    ImageFolderDataset,
    YoloDarknetFormatDetectionDataset,
)
from super_gradients_tpu.training.transforms.detection import (
    ComposeDetectionTransforms,
    DetectionHSV,
    DetectionHorizontalFlip,
    DetectionMixup,
    DetectionMosaic,
    DetectionPaddedRescale,
    DetectionRandomAffine,
    DetectionSample,
    DetectionStandardize,
)


def _sample(h=100, w=120, n=3, seed=0):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    boxes = np.stack([rng.rand(n) * 40, rng.rand(n) * 40, rng.rand(n) * 40 + 50, rng.rand(n) * 40 + 50], 1).astype(np.float32)
    return DetectionSample(img, boxes, np.arange(n, dtype=np.int32))


def test_hflip_involution():
    s = _sample()
    import random

    random.seed(0)
    t = DetectionHorizontalFlip(prob=1.0)
    flipped = t(s)
    back = t(flipped)
    np.testing.assert_allclose(back.bboxes_xyxy, s.bboxes_xyxy, atol=1e-4)
    np.testing.assert_array_equal(back.image, s.image)


def test_padded_rescale_boxes_scale():
    s = _sample(100, 200)
    out = DetectionPaddedRescale(input_dim=(320, 320))(s)
    assert out.image.shape == (320, 320, 3)
    r = 320 / 200
    np.testing.assert_allclose(out.bboxes_xyxy, s.bboxes_xyxy * r, rtol=1e-5)


def test_mosaic_produces_combined_sample():
    import random

    random.seed(1)
    s = _sample(seed=1)
    extra = [_sample(seed=i + 2) for i in range(3)]
    out = DetectionMosaic(input_dim=(128, 128), prob=1.0)(s, extra)
    assert out.image.shape == (256, 256, 3)
    assert len(out.labels) > 0


def test_random_affine_identity_like():
    import random

    random.seed(0)
    t = DetectionRandomAffine(degrees=0, translate=0.0, scales=(1.0, 1.0), shear=0, target_size=(100, 120))
    s = _sample()
    out = t(s)
    assert out.image.shape == (100, 120, 3)
    np.testing.assert_allclose(out.bboxes_xyxy, s.bboxes_xyxy, atol=1.5)


def test_hsv_preserves_shape_and_boxes():
    import random

    random.seed(0)
    s = _sample()
    out = DetectionHSV(prob=1.0)(s)
    assert out.image.shape == s.image.shape
    np.testing.assert_array_equal(out.bboxes_xyxy, s.bboxes_xyxy)


def test_mixup_merges_targets():
    import random

    random.seed(0)
    s, other = _sample(seed=0), _sample(seed=1)
    out = DetectionMixup(prob=1.0)(s, [other])
    assert len(out.labels) == len(s.labels) + len(other.labels)


def _make_coco(tmp_path, n_images=4):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 1
    rng = np.random.RandomState(0)
    for i in range(n_images):
        fname = f"img_{i}.jpg"
        Image.fromarray((rng.rand(80, 100, 3) * 255).astype(np.uint8)).save(img_dir / fname)
        images.append({"id": i + 1, "file_name": fname, "width": 100, "height": 80})
        for _ in range(rng.randint(1, 4)):
            x, y = rng.randint(0, 50), rng.randint(0, 40)
            w, h = rng.randint(10, 40), rng.randint(10, 30)
            annotations.append(
                {"id": aid, "image_id": i + 1, "category_id": int(rng.choice([1, 3])),
                 "bbox": [int(x), int(y), int(w), int(h)], "iscrowd": 0, "area": int(w * h)}
            )
            aid += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "cat"}, {"id": 3, "name": "dog"}],
    }
    with open(tmp_path / "ann.json", "w") as f:
        json.dump(coco, f)
    return str(tmp_path)


def test_coco_format_dataset(tmp_path):
    root = _make_coco(tmp_path)
    ds = COCOFormatDetectionDataset(
        data_dir=root,
        json_annotation_file="ann.json",
        images_dir="imgs",
        max_boxes=10,
        transforms=[DetectionPaddedRescale((64, 64)), DetectionStandardize()],
    )
    assert len(ds) == 4
    assert ds.classes == ["cat", "dog"]
    img, target = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert target.shape == (10, 5)
    valid = target[:, 0] >= 0
    assert valid.sum() >= 1
    assert target[valid, 1:].max() <= 64.0


def test_coco_class_inclusion(tmp_path):
    root = _make_coco(tmp_path)
    ds = COCOFormatDetectionDataset(
        data_dir=root, json_annotation_file="ann.json", images_dir="imgs", class_inclusion_list=["dog"], max_boxes=10
    )
    assert ds.classes == ["dog"]
    for i in range(len(ds)):
        _, t = ds[i]
        labels = t[t[:, 0] >= 0, 0]
        assert np.all(labels == 0)  # remapped to contiguous


def test_yolo_format_dataset(tmp_path):
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir(), lbl_dir.mkdir()
    Image.fromarray(np.zeros((40, 60, 3), np.uint8)).save(img_dir / "a.jpg")
    (lbl_dir / "a.txt").write_text("1 0.5 0.5 0.5 0.5\n")
    ds = YoloDarknetFormatDetectionDataset(
        data_dir=str(tmp_path), images_dir="images", labels_dir="labels", classes=["x", "y"], max_boxes=5
    )
    img, t = ds[0]
    assert t[0, 0] == 1
    np.testing.assert_allclose(t[0, 1:], [15, 10, 45, 30], atol=1e-3)


def test_image_folder_dataset(tmp_path):
    for cls in ["a", "b"]:
        (tmp_path / cls).mkdir()
        Image.fromarray(np.zeros((30, 30, 3), np.uint8)).save(tmp_path / cls / "1.jpg")
    ds = ImageFolderDataset(str(tmp_path), image_size=(32, 32))
    assert len(ds) == 2 and ds.classes == ["a", "b"]
    img, label = ds[1]
    assert img.shape == (32, 32, 3) and label == 1


def test_pascal_voc_dataset(tmp_path):
    from super_gradients_tpu.training.datasets import PascalVOCDetectionDataset

    (tmp_path / "JPEGImages").mkdir()
    (tmp_path / "Annotations").mkdir()
    Image.fromarray(np.zeros((50, 60, 3), np.uint8)).save(tmp_path / "JPEGImages" / "img1.jpg")
    (tmp_path / "Annotations" / "img1.xml").write_text(
        """<annotation><filename>img1.jpg</filename>
        <object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>5</xmin><ymin>10</ymin><xmax>30</xmax><ymax>40</ymax></bndbox></object>
        <object><name>unknown_cls</name><bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox></object>
        </annotation>"""
    )
    ds = PascalVOCDetectionDataset(data_dir=str(tmp_path), max_boxes=5)
    img, t = ds[0]
    valid = t[t[:, 0] >= 0]
    assert len(valid) == 1  # unknown class skipped
    assert valid[0, 0] == PascalVOCDetectionDataset.VOC_CLASSES.index("dog")
    np.testing.assert_allclose(valid[0, 1:], [5, 10, 30, 40])


def test_convert_recipe_to_code(tmp_path):
    from super_gradients_tpu.convert_recipe_to_code import main

    out = tmp_path / "script.py"
    main(["--config-name", "cifar10_resnet", "-o", str(out)])
    code = out.read_text()
    assert "models.get" in code and "cifar10_resnet" in code
    compile(code, str(out), "exec")  # syntactically valid
