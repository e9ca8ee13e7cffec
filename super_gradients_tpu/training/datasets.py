"""Datasets: COCO-format + YOLO-format detection, folder classification, segmentation.

Reference: ``training/datasets/`` — DetectionDataset base
(``detection_dataset.py:38-565``: transform chain with additional-samples feed,
class filtering, ignore_empty_annotations), COCOFormatDetectionDataset
(``coco_format_detection.py``, json parsing), YoloFormat (txt),
ImageNetDataset (folder), SegmentationDataSet (image+mask pairs).

TPU-native contract: every detection sample leaves the dataset as
``(image [H, W, 3] float32, targets [max_boxes, 5])`` — fixed shapes, -1-padded
(SURVEY §7 "Ragged targets"). COCO json parsed with stdlib json (no pycocotools
in this environment).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.registry import register_dataset
from super_gradients_tpu.training.transforms.detection import ComposeDetectionTransforms, DetectionSample

logger = get_logger(__name__)


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


class DetectionDataset:
    """Base detection dataset (ref detection_dataset.py:38).

    Subclasses implement ``_load_annotation(index) -> dict(img_path, boxes_xyxy,
    labels)``; this base handles the transform chain (with additional-sample feed
    for mosaic/mixup), class filtering, and fixed-shape target padding.
    """

    def __init__(
        self,
        transforms: Optional[Sequence] = None,
        max_boxes: int = 50,
        class_inclusion_list: Optional[Sequence[str]] = None,
        ignore_empty_annotations: bool = False,
        all_classes_list: Optional[Sequence[str]] = None,
        cache_images: bool = False,
        with_crowd: bool = False,
    ):
        self.transforms = ComposeDetectionTransforms(transforms or [])
        self.max_boxes = max_boxes
        self.all_classes_list = list(all_classes_list or [])
        self.class_inclusion_list = list(class_inclusion_list) if class_inclusion_list else None
        self.ignore_empty_annotations = ignore_empty_annotations
        self.cache_images = cache_images
        # with_crowd: emit [max_boxes, 6] targets with an is_crowd flag column —
        # consumed by DetectionMetrics crowd-IoA handling (ref CrowdDetectionCollateFN
        # + detection_utils.py:797 crowd_ioa)
        self.with_crowd = with_crowd
        self._image_cache: Dict[int, np.ndarray] = {}
        self._annotations: List[Dict] = []
        self._setup()
        if self.class_inclusion_list:
            keep_ids = {self.all_classes_list.index(c) for c in self.class_inclusion_list}
            remap = {old: new for new, old in enumerate(sorted(keep_ids))}
            filtered = []
            for ann in self._annotations:
                mask = np.isin(ann["labels"], list(keep_ids))
                ann = dict(ann, boxes_xyxy=ann["boxes_xyxy"][mask], labels=np.asarray([remap[int(l)] for l in ann["labels"][mask]], np.int32))
                if ann.get("is_crowd") is not None and len(ann["is_crowd"]) == len(mask):
                    ann["is_crowd"] = np.asarray(ann["is_crowd"])[mask]
                filtered.append(ann)
            self._annotations = filtered
            self.classes = list(self.class_inclusion_list)
        else:
            self.classes = list(self.all_classes_list)
        if self.ignore_empty_annotations:
            self._annotations = [a for a in self._annotations if len(a["labels"]) > 0]

    def _setup(self):
        raise NotImplementedError

    def __len__(self):
        return len(self._annotations)

    def _get_sample(self, index: int) -> DetectionSample:
        ann = self._annotations[index]
        if "img_path" in ann:
            # RAM cache (ref detection_dataset.py cache_images/cached_imgs_padded):
            # decode once, reuse across epochs — IO/jpeg-decode is the host-side
            # bottleneck feeding the TPU input pipeline
            if self.cache_images:
                if index not in self._image_cache:
                    self._image_cache[index] = _load_image(ann["img_path"])
                image = self._image_cache[index]
            else:
                image = _load_image(ann["img_path"])
        else:
            image = ann["image"]
        crowd = ann.get("is_crowd")
        return DetectionSample(
            image,
            ann["boxes_xyxy"].astype(np.float32),
            ann["labels"].astype(np.int32),
            np.asarray(crowd, bool) if crowd is not None else None,
        )

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        sample = self._get_sample(index)
        n_extra = self.transforms.additional_samples_count
        additional = [self._get_sample(np.random.randint(len(self))) for _ in range(n_extra)]
        sample = self.transforms(sample, additional)
        image = np.asarray(sample.image, dtype=np.float32)
        cols = 6 if self.with_crowd else 5
        target = np.full((self.max_boxes, cols), -1.0, dtype=np.float32)
        n = min(len(sample.labels), self.max_boxes)
        if n:
            target[:n, 0] = sample.labels[:n]
            target[:n, 1:5] = sample.bboxes_xyxy[:n]
            if self.with_crowd:
                crowd = sample.is_crowd[:n] if sample.is_crowd is not None else np.zeros(n, bool)
                target[:n, 5] = crowd.astype(np.float32)
        if self.with_crowd:
            target[n:, 5] = 0.0  # padding rows are never crowd
        return image, target

    def get_dataset_preprocessing_params(self) -> Dict:
        """Predict-ready params derived from the dataset's eval geometry
        (ref detection_dataset.get_dataset_preprocessing_params — builds the
        image_processor that matches the val transform chain)."""
        params: Dict = {"class_names": self.classes}
        # map the transform chain's letterbox geometry onto processing ops
        input_dim = None
        for t in getattr(self.transforms, "transforms", []):
            dim = getattr(t, "input_dim", None)
            if dim is not None:
                input_dim = tuple(dim)
        if input_dim is not None:
            from super_gradients_tpu.inference.processing import (
                ComposeProcessing,
                DetectionBottomRightPadding,
                DetectionLongestMaxSizeRescale,
                StandardizeImage,
            )

            params["image_processor"] = ComposeProcessing(
                [
                    DetectionLongestMaxSizeRescale(input_dim),
                    DetectionBottomRightPadding(input_dim, 114),
                    StandardizeImage(255.0),
                ]
            )
        return params

    def plot(self, max_samples_per_plot: int = 16, plot_transformed_data: bool = True):
        """Render a grid of (transformed) samples with their gt boxes and return it
        as an RGB array; shows it when matplotlib has an interactive backend
        (ref detection_dataset.py ``plot()``)."""
        from PIL import Image, ImageDraw

        n = min(len(self), max_samples_per_plot)
        drawn = []
        for i in range(n):
            if plot_transformed_data:
                image, target = self[i]
                boxes = target[target[:, 0] >= 0][:, 1:5]
            else:
                s = self._get_sample(i)
                image, boxes = s.image, s.bboxes_xyxy
            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
            im = Image.fromarray(arr)
            d = ImageDraw.Draw(im)
            for b in np.asarray(boxes):
                d.rectangle([float(b[0]), float(b[1]), float(b[2]), float(b[3])], outline=(255, 0, 0), width=2)
            drawn.append(np.asarray(im))
        if not drawn:
            return None
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
        h, w, c = drawn[0].shape
        grid = np.zeros((rows * h, cols * w, c), np.uint8)
        for i, im in enumerate(drawn):
            r, cc = divmod(i, cols)
            grid[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = im
        try:
            import matplotlib

            if matplotlib.get_backend().lower() not in ("agg", "template"):
                import matplotlib.pyplot as plt

                plt.figure(figsize=(10, 10))
                plt.imshow(grid)
                plt.axis("off")
                plt.show()
        except ImportError:
            pass
        return grid

    def get_dataset_classes_information(self) -> np.ndarray:
        """[N, num_classes] per-sample class counts (ref HasClassesInformation /
        dataset_interfaces — consumed by ClassBalancedSampler)."""
        n_cls = len(self.classes)
        info = np.zeros((len(self._annotations), n_cls), np.int64)
        for i, ann in enumerate(self._annotations):
            labels = np.asarray(ann["labels"], np.int64)
            if len(labels):
                info[i] = np.bincount(labels, minlength=n_cls)[:n_cls]
        return info


@register_dataset("COCOFormatDetectionDataset")
class COCOFormatDetectionDataset(DetectionDataset):
    """COCO instances json (ref coco_format_detection.py)."""

    def __init__(self, data_dir: str, json_annotation_file: str, images_dir: str = "", **kwargs):
        self.data_dir = data_dir
        self.json_annotation_file = json_annotation_file
        self.images_dir = images_dir
        super().__init__(**kwargs)

    def _setup(self):
        json_path = os.path.join(self.data_dir, self.json_annotation_file)
        with open(json_path) as f:
            coco = json.load(f)
        cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
        cat_id_to_contig = {c["id"]: i for i, c in enumerate(cats)}
        self.all_classes_list = [c["name"] for c in cats]

        anns_by_img: Dict[int, List] = {}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0) and not self.with_crowd:
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)

        for img in coco.get("images", []):
            anns = anns_by_img.get(img["id"], [])
            boxes, labels, crowd = [], [], []
            for a in anns:
                x, y, w, h = a["bbox"]
                if w <= 0 or h <= 0:
                    continue
                boxes.append([x, y, x + w, y + h])
                labels.append(cat_id_to_contig[a["category_id"]])
                crowd.append(bool(a.get("iscrowd", 0)))
            self._annotations.append(
                dict(
                    img_path=os.path.join(self.data_dir, self.images_dir, img["file_name"]),
                    boxes_xyxy=np.asarray(boxes, np.float32).reshape(-1, 4),
                    labels=np.asarray(labels, np.int32),
                    is_crowd=np.asarray(crowd, bool),
                )
            )


@register_dataset("COCODetectionDataset")
class COCODetectionDataset(COCOFormatDetectionDataset):
    """Standard COCO2017 layout (ref coco_detection.py)."""

    def __init__(self, data_dir: str, subdir: str = "images/val2017", json_file: str = "instances_val2017.json", **kwargs):
        super().__init__(
            data_dir=data_dir,
            json_annotation_file=os.path.join("annotations", json_file),
            images_dir=subdir,
            **kwargs,
        )


@register_dataset("YoloDarknetFormatDetectionDataset")
class YoloDarknetFormatDetectionDataset(DetectionDataset):
    """YOLO txt format: per-image ``.txt`` with (cls cx cy w h) normalized rows
    (ref yolo_format_detection.py)."""

    def __init__(self, data_dir: str, images_dir: str, labels_dir: str, classes: Sequence[str], **kwargs):
        self.data_dir = data_dir
        self.images_dir = images_dir
        self.labels_dir = labels_dir
        self._classes_arg = list(classes)
        super().__init__(all_classes_list=list(classes), **kwargs)

    def _setup(self):
        self.all_classes_list = self._classes_arg
        img_dir = os.path.join(self.data_dir, self.images_dir)
        lbl_dir = os.path.join(self.data_dir, self.labels_dir)
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        for fname in sorted(os.listdir(img_dir)):
            if not fname.lower().endswith(exts):
                continue
            img_path = os.path.join(img_dir, fname)
            from PIL import Image

            with Image.open(img_path) as im:
                w, h = im.size
            lbl_path = os.path.join(lbl_dir, os.path.splitext(fname)[0] + ".txt")
            boxes, labels = [], []
            if os.path.exists(lbl_path):
                for line in open(lbl_path).read().strip().splitlines():
                    parts = line.split()
                    if len(parts) < 5:
                        continue
                    c, cx, cy, bw, bh = float(parts[0]), *map(float, parts[1:5])
                    boxes.append([(cx - bw / 2) * w, (cy - bh / 2) * h, (cx + bw / 2) * w, (cy + bh / 2) * h])
                    labels.append(int(c))
            self._annotations.append(
                dict(img_path=img_path, boxes_xyxy=np.asarray(boxes, np.float32).reshape(-1, 4), labels=np.asarray(labels, np.int32))
            )


@register_dataset("ImageFolderDataset")
class ImageFolderDataset:
    """ImageNet-style folder/class layout (ref imagenet_dataset.py)."""

    def __init__(self, root: str, image_size: Tuple[int, int] = (224, 224), transforms: Optional[Callable] = None):
        self.root = root
        self.image_size = tuple(image_size)
        self.transforms = transforms
        self.classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
        self.samples: List[Tuple[str, int]] = []
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        for ci, cls in enumerate(self.classes):
            for fname in sorted(os.listdir(os.path.join(root, cls))):
                if fname.lower().endswith(exts):
                    self.samples.append((os.path.join(root, cls, fname), ci))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        path, label = self.samples[i]
        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("RGB").resize((self.image_size[1], self.image_size[0]), Image.BILINEAR)
            img = np.asarray(im, dtype=np.float32) / 255.0
        if self.transforms:
            img = self.transforms(img)
        return img, np.int32(label)


@register_dataset("SegmentationDataset")
class SegmentationDataset:
    """Paired image/mask folders (ref segmentation_dataset.py)."""

    def __init__(self, root: str, images_dir: str = "images", masks_dir: str = "masks", image_size: Tuple[int, int] = (512, 512)):
        self.root = root
        self.image_size = tuple(image_size)
        img_dir = os.path.join(root, images_dir)
        self.mask_dir = os.path.join(root, masks_dir)
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        self.items = [f for f in sorted(os.listdir(img_dir)) if f.lower().endswith(exts)]
        self.img_dir = img_dir

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        from PIL import Image

        name = self.items[i]
        with Image.open(os.path.join(self.img_dir, name)) as im:
            img = np.asarray(im.convert("RGB").resize((self.image_size[1], self.image_size[0]), Image.BILINEAR), np.float32) / 255.0
        base = os.path.splitext(name)[0]
        mask_path = None
        for ext in (".png", ".jpg", ".bmp"):
            p = os.path.join(self.mask_dir, base + ext)
            if os.path.exists(p):
                mask_path = p
                break
        with Image.open(mask_path) as m:
            mask = np.asarray(m.resize((self.image_size[1], self.image_size[0]), Image.NEAREST), np.int32)
        if mask.ndim == 3:
            mask = mask[..., 0]
        return img, mask


@register_dataset("PascalVOCDetectionDataset")
class PascalVOCDetectionDataset(DetectionDataset):
    """Pascal VOC XML annotations (ref pascal_voc_detection.py / pascal_voc_format_detection.py)."""

    VOC_CLASSES = (
        "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat", "chair",
        "cow", "diningtable", "dog", "horse", "motorbike", "person", "pottedplant",
        "sheep", "sofa", "train", "tvmonitor",
    )

    def __init__(self, data_dir: str, images_dir: str = "JPEGImages", annotations_dir: str = "Annotations",
                 image_set_file: Optional[str] = None, classes: Optional[Sequence[str]] = None, **kwargs):
        self.data_dir = data_dir
        self.images_dir = images_dir
        self.annotations_dir = annotations_dir
        self.image_set_file = image_set_file
        self._voc_classes = list(classes or self.VOC_CLASSES)
        super().__init__(all_classes_list=self._voc_classes, **kwargs)

    def _setup(self):
        import xml.etree.ElementTree as ET

        self.all_classes_list = self._voc_classes
        cls_to_id = {c: i for i, c in enumerate(self._voc_classes)}
        ann_dir = os.path.join(self.data_dir, self.annotations_dir)
        if self.image_set_file:
            with open(os.path.join(self.data_dir, self.image_set_file)) as f:
                ids = [line.strip().split()[0] for line in f if line.strip()]
            xml_files = [f"{i}.xml" for i in ids]
        else:
            xml_files = sorted(f for f in os.listdir(ann_dir) if f.endswith(".xml"))
        for xf in xml_files:
            tree = ET.parse(os.path.join(ann_dir, xf))
            root = tree.getroot()
            fname = root.findtext("filename") or xf.replace(".xml", ".jpg")
            boxes, labels = [], []
            for obj in root.iter("object"):
                name = obj.findtext("name")
                if name not in cls_to_id:
                    continue
                if (obj.findtext("difficult") or "0") == "1":
                    continue
                bb = obj.find("bndbox")
                x1, y1 = float(bb.findtext("xmin")), float(bb.findtext("ymin"))
                x2, y2 = float(bb.findtext("xmax")), float(bb.findtext("ymax"))
                boxes.append([x1, y1, x2, y2])
                labels.append(cls_to_id[name])
            self._annotations.append(
                dict(img_path=os.path.join(self.data_dir, self.images_dir, fname),
                     boxes_xyxy=np.asarray(boxes, np.float32).reshape(-1, 4),
                     labels=np.asarray(labels, np.int32))
            )


# Cityscapes trainId remap table (public constants; ref cityscapes_dataset.py)
CITYSCAPES_ID_TO_TRAIN_ID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9, 23: 10,
    24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}


@register_dataset("CityscapesDataset")
class CityscapesDataset(SegmentationDataset):
    """Cityscapes leftImg8bit/gtFine layout with labelId->trainId remap
    (ref segmentation_datasets/cityscape_segmentation.py)."""

    def __init__(self, root: str, split: str = "train", image_size: Tuple[int, int] = (512, 1024)):
        self.root = root
        self.image_size = tuple(image_size)
        img_root = os.path.join(root, "leftImg8bit", split)
        gt_root = os.path.join(root, "gtFine", split)
        self.pairs: List[Tuple[str, str]] = []
        for city in sorted(os.listdir(img_root)) if os.path.isdir(img_root) else []:
            for f in sorted(os.listdir(os.path.join(img_root, city))):
                if f.endswith("_leftImg8bit.png"):
                    mask = f.replace("_leftImg8bit.png", "_gtFine_labelIds.png")
                    self.pairs.append((os.path.join(img_root, city, f), os.path.join(gt_root, city, mask)))
        lut = np.full(256, 255, np.int32)
        for k, v in CITYSCAPES_ID_TO_TRAIN_ID.items():
            lut[k] = v
        self._lut = lut

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        from PIL import Image

        img_path, mask_path = self.pairs[i]
        with Image.open(img_path) as im:
            img = np.asarray(im.convert("RGB").resize((self.image_size[1], self.image_size[0]), Image.BILINEAR), np.float32) / 255.0
        with Image.open(mask_path) as m:
            mask = np.asarray(m.resize((self.image_size[1], self.image_size[0]), Image.NEAREST), np.int32)
        return img, self._lut[np.clip(mask, 0, 255)]


@register_dataset("COCOPoseEstimationDataset")
class COCOPoseEstimationDataset:
    """COCO person_keypoints json → padded [max_poses, 5+3K] targets
    (ref pose_estimation_datasets/coco_keypoints.py; stdlib-json parsing)."""

    def __init__(self, data_dir: str, json_annotation_file: str, images_dir: str = "",
                 max_poses: int = 30, num_joints: int = 17, transforms: Optional[Sequence] = None,
                 min_visible_joints: int = 1):
        from super_gradients_tpu.training.transforms.keypoints import ComposeKeypointTransforms

        self.data_dir = data_dir
        self.images_dir = images_dir
        self.max_poses = max_poses
        self.num_joints = num_joints
        self.transforms = ComposeKeypointTransforms(transforms or [])
        with open(os.path.join(data_dir, json_annotation_file)) as f:
            coco = json.load(f)
        anns_by_img: Dict[int, List] = {}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0) or a.get("num_keypoints", 0) < min_visible_joints:
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self.items = []
        for img in coco.get("images", []):
            anns = anns_by_img.get(img["id"], [])
            if not anns:
                continue
            self.items.append((os.path.join(data_dir, images_dir, img["file_name"]), anns))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        from super_gradients_tpu.training.transforms.keypoints import PoseSample

        path, anns = self.items[i]
        image = _load_image(path)
        boxes, joints = [], []
        for a in anns:
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
            joints.append(np.asarray(a["keypoints"], np.float32).reshape(self.num_joints, 3))
        sample = PoseSample(image, np.asarray(boxes, np.float32), np.stack(joints))
        sample = self.transforms(sample)
        return np.asarray(sample.image, np.float32), sample.to_padded_targets(self.max_poses)


# -------------------------------------------------------------- classification
# CIFAR (reference datasets/classification_datasets/cifar.py — torchvision
# CIFAR10/100 with SG transform composition; here: direct reads of the standard
# python-pickle batch files, host-numpy augmentations).

_CIFAR10_MEAN = np.asarray([0.4914, 0.4822, 0.4465], np.float32)
_CIFAR10_STD = np.asarray([0.2470, 0.2435, 0.2616], np.float32)
_CIFAR100_MEAN = np.asarray([0.5071, 0.4865, 0.4409], np.float32)
_CIFAR100_STD = np.asarray([0.2673, 0.2564, 0.2762], np.float32)


class _CIFARBase:
    """Shared loader for the CIFAR python-pickle format.

    ``train=True`` applies the reference train augmentations: RandomCrop(32, pad 4)
    + horizontal flip; both splits normalize with the per-dataset mean/std.
    """

    mean = _CIFAR10_MEAN
    std = _CIFAR10_STD

    def __init__(self, root: str, train: bool = True, seed: int = 0):
        import pickle

        self.train = train
        images, labels = [], []
        for fname in self._batch_files(train):
            path = os.path.join(root, fname)
            with open(path, "rb") as f:
                d = pickle.load(f, encoding="bytes")
            data = d[b"data"] if b"data" in d else d["data"]
            lab = d.get(b"labels") or d.get(b"fine_labels") or d.get("labels") or d.get("fine_labels")
            images.append(np.asarray(data, np.uint8).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
            labels.append(np.asarray(lab, np.int32))
        self.images = np.concatenate(images)
        self.labels = np.concatenate(labels)
        self.rng = np.random.RandomState(seed)

    def _batch_files(self, train: bool) -> List[str]:
        raise NotImplementedError

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img = self.images[i].astype(np.float32) / 255.0
        if self.train:
            # RandomCrop(32, padding=4)
            padded = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="constant")
            y, x = self.rng.randint(0, 9, size=2)
            img = padded[y : y + 32, x : x + 32]
            if self.rng.rand() < 0.5:
                img = img[:, ::-1]
        img = (img - self.mean) / self.std
        return np.ascontiguousarray(img), self.labels[i]


@register_dataset("Cifar10")
@register_dataset("CIFAR10Dataset")
class CIFAR10Dataset(_CIFARBase):
    """CIFAR-10 from ``root/cifar-10-batches-py`` (or ``root`` directly)."""

    mean, std = _CIFAR10_MEAN, _CIFAR10_STD

    def __init__(self, root: str, train: bool = True, seed: int = 0):
        sub = os.path.join(root, "cifar-10-batches-py")
        super().__init__(sub if os.path.isdir(sub) else root, train, seed)

    def _batch_files(self, train: bool) -> List[str]:
        return [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]


@register_dataset("Cifar100")
@register_dataset("CIFAR100Dataset")
class CIFAR100Dataset(_CIFARBase):
    """CIFAR-100 from ``root/cifar-100-python`` (or ``root`` directly)."""

    mean, std = _CIFAR100_MEAN, _CIFAR100_STD

    def __init__(self, root: str, train: bool = True, seed: int = 0):
        sub = os.path.join(root, "cifar-100-python")
        super().__init__(sub if os.path.isdir(sub) else root, train, seed)

    def _batch_files(self, train: bool) -> List[str]:
        return ["train"] if train else ["test"]
