"""Segmentation datasets beyond paired-dir/Cityscapes.

Reference parity: ``datasets/segmentation_datasets/`` —
- CoCoSegmentationDataSet (coco_segmentation.py:26-160): COCO instances json →
  class-index masks with a class-inclusion sub-dataset.
- PascalVOC2012SegmentationDataSet (pascal_voc_segmentation.py): JPEGImages +
  SegmentationClass palette masks + ImageSets splits.
- MapillaryDataset (mapillary_dataset.py:13-94): config json labels + images/labels
  dirs (v1.2 = 65 classes + ignore 65).
- SuperviselyPersonsDataset (supervisely_persons_segmentation.py:10-60): csv list of
  image,mask pairs, binary person masks.

TPU-native notes: masks are rasterized host-side with stdlib json + PIL polygon fill
and a pure-numpy COCO RLE decoder (no pycocotools/torch); every dataset yields
``(image float32 [H,W,3] 0-1, mask int32 [H,W])`` at a fixed ``image_size`` so batches
are static-shape for XLA.
"""

from __future__ import annotations

import csv
import json
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.registry import register_dataset

# COCO 2017 default (category_id, name) sub-classes used by the reference
# (coco_segmentation.py COCO_DEFAULT_CLASSES_TUPLES_LIST equivalent: 21 PASCAL-like classes)
COCO_DEFAULT_CLASSES_TUPLES_LIST = [
    (0, "background"), (5, "airplane"), (2, "bicycle"), (16, "bird"), (9, "boat"),
    (44, "bottle"), (6, "bus"), (3, "car"), (17, "cat"), (62, "chair"), (21, "cow"),
    (67, "dining table"), (18, "dog"), (19, "horse"), (4, "motorcycle"), (1, "person"),
    (64, "potted plant"), (20, "sheep"), (63, "couch"), (7, "train"), (72, "tv"),
]


def _decode_compressed_rle(counts: str, h: int, w: int) -> np.ndarray:
    """Decode COCO compressed RLE (pycocotools string format) in pure python/numpy."""
    runs: List[int] = []
    i, n = 0, len(counts)
    while i < n:
        x, k, more = 0, 0, True
        while more:
            c = ord(counts[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(runs) > 2:
            x += runs[-2]
        runs.append(x)
    mask = np.zeros(h * w, np.uint8)
    pos, val = 0, 0
    for run in runs:
        if val:
            mask[pos : pos + run] = 1
        pos += run
        val ^= 1
    return mask.reshape(w, h).T  # COCO RLE is column-major


def _segmentation_to_mask(segmentation, h: int, w: int) -> np.ndarray:
    """Any COCO ``segmentation`` payload (polygons / RLE dict) → binary [H, W]."""
    from PIL import Image, ImageDraw

    if isinstance(segmentation, dict):
        counts = segmentation["counts"]
        sh, sw = segmentation["size"]
        if isinstance(counts, str):
            return _decode_compressed_rle(counts, sh, sw)
        mask = np.zeros(sh * sw, np.uint8)
        pos, val = 0, 0
        for run in counts:
            if val:
                mask[pos : pos + run] = 1
            pos += run
            val ^= 1
        return mask.reshape(sw, sh).T
    img = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(img)
    for poly in segmentation:
        pts = [(poly[i], poly[i + 1]) for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, np.uint8)


def _load_resized(path: str, image_size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(
            im.convert("RGB").resize((image_size[1], image_size[0]), Image.BILINEAR), np.float32
        ) / 255.0


def _resize_mask(mask: np.ndarray, image_size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.fromarray(mask.astype(np.uint8)).resize((image_size[1], image_size[0]), Image.NEAREST), np.int32
    )


@register_dataset("CoCoSegmentationDataset")
class CoCoSegmentationDataset:
    """COCO instances json → class-index masks (ref coco_segmentation.py:26-160).

    Instances whose category is outside ``dataset_classes_inclusion_tuples_list`` are
    dropped; overlapping instances keep the first-painted class (ref `(mask == 0)`
    accumulate). Images with < ``min_pixels`` foreground after filtering are skipped
    (ref `_sub_dataset_creation` 1000-px rule).
    """

    def __init__(
        self,
        data_dir: str,
        subdir: str = "images/val2017",
        json_file: str = "instances_val2017.json",
        dataset_classes_inclusion_tuples_list: Optional[Sequence[Tuple[int, str]]] = None,
        image_size: Tuple[int, int] = (512, 512),
        min_pixels: int = 1000,
    ):
        self.data_dir = data_dir
        self.subdir = subdir
        self.image_size = tuple(image_size)
        self.inclusion = list(dataset_classes_inclusion_tuples_list or COCO_DEFAULT_CLASSES_TUPLES_LIST)
        self.cat_to_idx = {cat_id: i for i, (cat_id, _) in enumerate(self.inclusion)}
        self.classes = [name for _, name in self.inclusion]

        ann_path = os.path.join(data_dir, "annotations", json_file)
        if not os.path.exists(ann_path):
            ann_path = os.path.join(data_dir, json_file)
        with open(ann_path) as f:
            coco = json.load(f)
        self.images = {im["id"]: im for im in coco["images"]}
        anns_by_image: dict = {}
        for a in coco["annotations"]:
            if a.get("iscrowd", 0) and not isinstance(a.get("segmentation"), dict):
                continue
            if a["category_id"] in self.cat_to_idx:
                anns_by_image.setdefault(a["image_id"], []).append(a)
        # keep images with enough labeled area (cheap proxy: sum of annotation areas)
        self.items = [
            (img_id, anns)
            for img_id, anns in anns_by_image.items()
            if sum(a.get("area", 0) for a in anns) > min_pixels
        ]

    def __len__(self):
        return len(self.items)

    def _render_mask(self, anns, h: int, w: int) -> np.ndarray:
        mask = np.zeros((h, w), np.uint8)
        for a in anns:
            idx = self.cat_to_idx[a["category_id"]]
            if idx == 0:
                continue
            inst = _segmentation_to_mask(a["segmentation"], h, w)
            mask += ((mask == 0) & (inst > 0)).astype(np.uint8) * idx
        return mask

    def __getitem__(self, i):
        img_id, anns = self.items[i]
        meta = self.images[img_id]
        img = _load_resized(os.path.join(self.data_dir, self.subdir, meta["file_name"]), self.image_size)
        mask = self._render_mask(anns, meta["height"], meta["width"])
        return img, _resize_mask(mask, self.image_size)


@register_dataset("PascalVOC2012SegmentationDataset")
class PascalVOC2012SegmentationDataset:
    """VOC2012 layout: JPEGImages/ + SegmentationClass/ palette PNGs + ImageSets
    splits (ref pascal_voc_segmentation.py PascalVOC2012SegmentationDataSet)."""

    IGNORE_LABEL = 255
    VOC_CLASSES = [
        "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
        "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
        "pottedplant", "sheep", "sofa", "train", "tvmonitor",
    ]

    def __init__(self, root: str, split: str = "train", image_size: Tuple[int, int] = (512, 512),
                 images_dir: str = "JPEGImages", masks_dir: str = "SegmentationClass"):
        self.root = root
        self.image_size = tuple(image_size)
        self.images_dir = os.path.join(root, images_dir)
        self.masks_dir = os.path.join(root, masks_dir)
        self.classes = list(self.VOC_CLASSES)
        list_path = os.path.join(root, "ImageSets", "Segmentation", f"{split}.txt")
        if os.path.exists(list_path):
            with open(list_path) as f:
                self.names = [ln.strip() for ln in f if ln.strip()]
        else:  # fall back to every mask present
            self.names = [os.path.splitext(n)[0] for n in sorted(os.listdir(self.masks_dir)) if n.endswith(".png")]

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i):
        from PIL import Image

        name = self.names[i]
        img = _load_resized(os.path.join(self.images_dir, name + ".jpg"), self.image_size)
        with Image.open(os.path.join(self.masks_dir, name + ".png")) as m:
            mask = np.asarray(m.resize((self.image_size[1], self.image_size[0]), Image.NEAREST), np.int32)
        return img, mask


@register_dataset("MapillaryDataset")
class MapillaryDataset:
    """Mapillary Vistas (ref mapillary_dataset.py:13-94): label config json + paired
    images/labels dirs; v1.2 = 65 classes, ignore label 65."""

    IGNORE_LABEL_V1_2 = 65

    def __init__(self, root_dir: str, config_file: str = "config_v1.2.json",
                 samples_sub_directory: str = "training/images",
                 targets_sub_directory: str = "training/v1.2/labels",
                 image_size: Tuple[int, int] = (512, 512)):
        self.root = root_dir
        self.image_size = tuple(image_size)
        self.samples_dir = os.path.join(root_dir, samples_sub_directory)
        self.targets_dir = os.path.join(root_dir, targets_sub_directory)
        with open(os.path.join(root_dir, config_file)) as f:
            config = json.load(f)
        self.labels = config["labels"]
        self.label_names = [lb["readable"].replace(" ", "_") for lb in self.labels]
        # SG convention: class list excludes the trailing `Unlabeled` ignore class
        self.classes = [n for n in self.label_names if n.lower() != "unlabeled"]
        self.names = [os.path.splitext(n)[0] for n in sorted(os.listdir(self.targets_dir)) if n.endswith(".png")]

    def __len__(self):
        return len(self.names)

    def __getitem__(self, i):
        from PIL import Image

        name = self.names[i]
        img = _load_resized(os.path.join(self.samples_dir, name + ".jpg"), self.image_size)
        with Image.open(os.path.join(self.targets_dir, name + ".png")) as m:
            mask = np.asarray(m.resize((self.image_size[1], self.image_size[0]), Image.NEAREST), np.int32)
        if mask.ndim == 3:
            mask = mask[..., 0]
        return img, mask


@register_dataset("SuperviselyPersonsDataset")
class SuperviselyPersonsDataset:
    """CSV-listed image,mask pairs; binary person masks
    (ref supervisely_persons_segmentation.py:10-60)."""

    CLASS_LABELS = {0: "background", 1: "person"}

    def __init__(self, root_dir: str, list_file: str, image_size: Tuple[int, int] = (480, 320)):
        self.root = root_dir
        self.image_size = tuple(image_size)
        self.classes = ["person"]
        self.pairs: List[Tuple[str, str]] = []
        with open(os.path.join(root_dir, list_file), encoding="utf-8") as f:
            for row in csv.reader(f):
                if len(row) < 2:
                    continue
                s, t = os.path.join(root_dir, row[0]), os.path.join(root_dir, row[1])
                if os.path.exists(s) and os.path.exists(t):
                    self.pairs.append((s, t))

    def __len__(self):
        return len(self.pairs)

    def __getitem__(self, i):
        from PIL import Image

        s, t = self.pairs[i]
        img = _load_resized(s, self.image_size)
        with Image.open(t) as m:
            mask = np.asarray(m.convert("L").resize((self.image_size[1], self.image_size[0]), Image.NEAREST), np.int32)
        return img, (mask > 0).astype(np.int32)
