"""Dataloaders: host-side numpy pipelines feeding the device mesh.

Reference parity: ``training/dataloaders/dataloaders.py`` — ``get(name | dataset,
dataset_params, dataloader_params)`` (:889) + named test loaders with zero-tensor
datasets (:585-606) used across the e2e test-suite.

TPU-native notes: batches are numpy pytrees ``(inputs, targets)``; the Trainer
device_puts them with batch-axis sharding. On multi-host each process loads its
``jax.process_index()``-keyed shard (``sharded=True``). Static shapes: detection
targets are padded to ``[B, max_boxes, 5]`` (cls, x1, y1, x2, y2) with -1 class
padding — replacing the reference's ragged ``[N, 6]`` format (SURVEY §7).
"""

from __future__ import annotations

import atexit
import math
import os
import queue as queue_mod
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.registry import DATALOADERS, register_dataloader

logger = get_logger(__name__)


def _picklable(obj) -> bool:
    import pickle

    try:
        pickle.dumps(obj)
        return True
    except Exception:
        return False


def _worker_loop(dataset, collate_fn, index_q, result_q):
    """Worker process body: pull (batch_id, indices), push (batch_id, batch).

    ``batch_id`` is an opaque tag echoed back verbatim — the pool uses
    ``(generation, index)`` tuples so results from an abandoned epoch can be
    discarded. Loading + transforms (mosaic/mixup/affine/decode) run here, off
    the main process — the TPU-feed analogue of torch DataLoader workers
    (ref dataloaders.py:56-227)."""
    result_q.put(("__ready__", None, None))
    while True:
        item = index_q.get()
        if item is None:
            return
        batch_id, indices = item
        try:
            samples = [dataset[int(j)] for j in indices]
            result_q.put((batch_id, collate_fn(samples), None))
        except BaseException as e:  # surface worker crashes to the main process
            result_q.put((batch_id, None, f"{type(e).__name__}: {e}"))


class _WorkerPool:
    """Persistent fork-based worker pool with bounded in-flight batches.

    Workers inherit the dataset via fork (no dataset pickling); batches return
    through an mp queue. The pool lives across epochs so per-epoch startup cost
    is zero after the first use."""

    # Start-method preference: os.fork() after JAX/XLA initialization is unsafe
    # (the parent is multithreaded — CPython itself warns about fork deadlocks), so
    # when the dataset+collate pickle cleanly we use forkserver, whose children are
    # forked from a clean single-threaded server process. fork stays as the
    # fallback for unpicklable datasets. SG_WORKER_START_METHOD overrides.
    _READY_TIMEOUT_S = 120.0

    def __init__(self, dataset, collate_fn, num_workers: int, prefetch_factor: int):
        self.num_workers = num_workers
        self.max_inflight = max(2, num_workers * prefetch_factor)
        self._gen = 0
        self._closed = False
        method = os.environ.get("SG_WORKER_START_METHOD")
        if method is None:
            method = "forkserver" if _picklable((dataset, collate_fn)) else "fork"
        try:
            self._start(method, dataset, collate_fn)
        except Exception as e:
            if method == "fork":
                raise
            # forkserver children import the dataset's module from scratch; if that
            # fails (e.g. a dataset class defined in a non-importable script) fall
            # back to fork, which inherits the parent's memory image
            logger.warning(f"{method} worker pool failed to start ({e}); retrying with fork")
            self._start("fork", dataset, collate_fn)
        atexit.register(self.close)

    def _start(self, method: str, dataset, collate_fn):
        import multiprocessing as mp

        ctx = mp.get_context(method)
        self.index_q = ctx.Queue()
        self.result_q = ctx.Queue()
        self.workers = [
            ctx.Process(target=_worker_loop, args=(dataset, collate_fn, self.index_q, self.result_q), daemon=True)
            for _ in range(self.num_workers)
        ]
        for w in self.workers:
            w.start()
        # handshake: every worker reports ready before any work is submitted, so a
        # child that dies during import/unpickle fails fast here instead of hanging
        # the first result_q.get() forever
        try:
            for _ in self.workers:
                tag, _, _ = self.result_q.get(timeout=self._READY_TIMEOUT_S)
                if tag != "__ready__":  # pragma: no cover - defensive
                    raise RuntimeError(f"unexpected worker handshake message {tag!r}")
        except Exception:
            self._terminate_workers()
            raise

    def _terminate_workers(self):
        for w in getattr(self, "workers", []):
            try:
                w.terminate()
            except Exception:
                pass

    def close(self):
        if self._closed:
            return
        self._closed = True
        try:
            for _ in self.workers:
                self.index_q.put(None)
            for w in self.workers:
                w.join(timeout=2)
                if w.is_alive():
                    w.terminate()
        except Exception:
            pass

    def run_epoch(self, idx: np.ndarray, batch_size: int, n_batches: int) -> Iterator:
        """Yield collated batches IN ORDER with up to max_inflight outstanding.

        Every submission is tagged with a generation counter so that when a
        consumer abandons the iterator mid-epoch (max_train_batches break,
        device-prefetch buffers), in-flight results from the old generation are
        discarded instead of colliding with the next epoch's batch ids — a
        stale result would otherwise be silently yielded as a wrong batch."""
        self._gen += 1
        gen = self._gen
        submitted = 0
        pending: Dict[int, Any] = {}
        next_out = 0
        while submitted < n_batches and submitted < self.max_inflight:
            chunk = idx[submitted * batch_size : (submitted + 1) * batch_size]
            self.index_q.put(((gen, submitted), chunk))
            submitted += 1
        while next_out < n_batches:
            while next_out not in pending:
                (bgen, batch_id), batch, err = self.result_q.get()
                if bgen != gen:
                    continue  # stale result from an abandoned earlier epoch
                if err is not None:
                    self.close()
                    raise RuntimeError(f"DataLoader worker failed on batch {batch_id}: {err}")
                pending[batch_id] = batch
            batch = pending.pop(next_out)
            next_out += 1
            if submitted < n_batches:
                chunk = idx[submitted * batch_size : (submitted + 1) * batch_size]
                self.index_q.put(((gen, submitted), chunk))
                submitted += 1
            yield batch


class _PrefetchThread:
    """Single background thread running load+collate ahead of the consumer.

    Used for num_workers>0 when fork is unavailable, or as a cheap overlap layer
    (the producing thread spends most of its time in numpy/cv2/PIL which release
    the GIL)."""

    def __init__(self, make_iter: Callable[[], Iterator], depth: int):
        self.make_iter = make_iter
        self.depth = depth

    def __iter__(self):
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.depth)
        SENTINEL = object()

        def produce():
            try:
                for item in self.make_iter():
                    q.put(item)
                q.put(SENTINEL)
            except BaseException as e:
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item


class DataLoader:
    """Epoch-reshuffling loader with optional worker processes + prefetch.

    ``num_workers=0`` loads inline (deterministic, test-friendly).
    ``num_workers>0`` forks persistent worker processes that run dataset access
    and collate off the main process, keeping ``prefetch_factor`` batches per
    worker in flight — the torch-DataLoader analogue (ref dataloaders.py:56-227)
    needed so mosaic/mixup host transforms don't starve the TPU (SURVEY §7)."""

    def __init__(
        self,
        dataset,
        batch_size: int = 32,
        shuffle: bool = False,
        drop_last: bool = True,
        collate_fn: Optional[Callable] = None,
        seed: int = 0,
        min_samples: Optional[int] = None,
        sampler=None,
        num_workers: int = 0,
        prefetch_factor: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn or default_collate
        self.seed = seed
        self.sampler = sampler  # overrides index generation (training/samplers.py)
        self.num_workers = int(num_workers)
        self.prefetch_factor = int(prefetch_factor)
        self._pool: Optional[_WorkerPool] = None
        self._epoch = 0
        # min_samples padding (ref dataloaders.py:165-227): repeat indices so tiny
        # datasets still fill every batch
        n = len(dataset)
        if min_samples is not None and n < min_samples:
            reps = math.ceil(min_samples / n)
            self._indices = np.tile(np.arange(n), reps)[:min_samples]
        else:
            self._indices = np.arange(n)

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self._indices)
        return n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)

    def close(self):
        if self._pool is not None:
            self._pool.close()
            self._pool = None

    def _epoch_indices(self) -> np.ndarray:
        if self.sampler is not None:
            return np.asarray(list(iter(self.sampler)))
        idx = self._indices.copy()
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _iter_inline(self, idx: np.ndarray) -> Iterator:
        for i in range(len(self)):
            chunk = idx[i * self.batch_size : (i + 1) * self.batch_size]
            samples = [self.dataset[int(j)] for j in chunk]
            yield self.collate_fn(samples)

    def __iter__(self) -> Iterator:
        idx = self._epoch_indices()
        if self.num_workers <= 0:
            yield from self._iter_inline(idx)
            return
        if self._pool is None:
            try:
                self._pool = _WorkerPool(self.dataset, self.collate_fn, self.num_workers, self.prefetch_factor)
            except Exception as e:  # fork unavailable (or unpicklable ctx) → threaded overlap
                logger.warning(f"worker pool unavailable ({e}); using background-thread prefetch")
                self.num_workers = 0
                yield from _PrefetchThread(lambda: self._iter_inline(idx), depth=self.prefetch_factor * 2)
                return
        yield from self._pool.run_epoch(idx, self.batch_size, len(self))


def default_collate(samples: Sequence[Tuple]) -> Tuple:
    """Stack tuple elements into numpy arrays."""
    transposed = list(zip(*samples))
    return tuple(np.stack([np.asarray(s) for s in col]) for col in transposed)


# ------------------------------------------------------------- fake datasets
# (reference ships zero-tensor TensorDatasets in the library for tests,
# dataloaders.py:585-606 — same approach here)


class RandomClassificationDataset:
    def __init__(self, num_samples: int = 64, image_size: Tuple[int, int] = (64, 64), num_classes: int = 10, channels: int = 3, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.channels = channels
        self.rng = np.random.RandomState(seed)
        self._images = self.rng.rand(num_samples, *self.image_size, channels).astype(np.float32)
        self._labels = self.rng.randint(0, num_classes, size=num_samples).astype(np.int32)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        return self._images[i], self._labels[i]


class RandomDetectionDataset:
    """Images + padded [max_boxes, 5] targets (cls, x1, y1, x2, y2), -1 = pad."""

    def __init__(self, num_samples: int = 32, image_size: Tuple[int, int] = (320, 320), num_classes: int = 80, max_boxes: int = 20, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.max_boxes = max_boxes
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        rng = np.random.RandomState(self.rng.randint(0, 2**31) if False else i)
        h, w = self.image_size
        img = rng.rand(h, w, 3).astype(np.float32)
        n = rng.randint(1, max(2, self.max_boxes // 2))
        cxy = rng.rand(n, 2) * [w * 0.8, h * 0.8] + [w * 0.1, h * 0.1]
        wh = rng.rand(n, 2) * [w * 0.3, h * 0.3] + 8
        x1y1 = np.maximum(cxy - wh / 2, 0)
        x2y2 = np.minimum(cxy + wh / 2, [w, h])
        cls = rng.randint(0, self.num_classes, size=(n, 1)).astype(np.float32)
        target = np.full((self.max_boxes, 5), -1.0, dtype=np.float32)
        target[:n] = np.concatenate([cls, x1y1, x2y2], axis=1)
        return img, target


class RandomPoseDataset:
    """Images + padded [max_poses, 5 + 3K] pose targets (valid, box, K*(x,y,v))."""

    def __init__(self, num_samples: int = 16, image_size: Tuple[int, int] = (64, 64), num_joints: int = 17, max_poses: int = 8, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_joints = num_joints
        self.max_poses = max_poses
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        h, w = self.image_size
        k = self.num_joints
        img = rng.rand(h, w, 3).astype(np.float32)
        n = rng.randint(1, max(2, self.max_poses // 2))
        target = np.full((self.max_poses, 5 + 3 * k), -1.0, dtype=np.float32)
        for j in range(n):
            cx, cy = rng.rand(2) * [w * 0.6, h * 0.6] + [w * 0.2, h * 0.2]
            bw, bh = rng.rand(2) * [w * 0.3, h * 0.3] + 10
            x1, y1 = max(cx - bw / 2, 0), max(cy - bh / 2, 0)
            x2, y2 = min(cx + bw / 2, w), min(cy + bh / 2, h)
            kp = np.stack([
                rng.uniform(x1, x2, k), rng.uniform(y1, y2, k), rng.randint(0, 3, k).astype(np.float64)
            ], axis=1)
            target[j, 0] = 0.0
            target[j, 1:5] = [x1, y1, x2, y2]
            target[j, 5:] = kp.reshape(-1)
        return img, target


@register_dataloader("pose_test_dataloader")
def pose_test_dataloader(batch_size: int = 8, image_size: Tuple[int, int] = (64, 64), dataset_size: int = 16, num_joints: int = 17, **kw) -> DataLoader:
    return DataLoader(RandomPoseDataset(dataset_size, image_size, num_joints), batch_size=batch_size, shuffle=True)


class RandomSegmentationDataset:
    def __init__(self, num_samples: int = 16, image_size: Tuple[int, int] = (128, 128), num_classes: int = 19, seed: int = 0):
        self.num_samples = num_samples
        self.image_size = tuple(image_size)
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.num_samples

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed + i)
        h, w = self.image_size
        return rng.rand(h, w, 3).astype(np.float32), rng.randint(0, self.num_classes, size=(h, w)).astype(np.int32)


# ------------------------------------------------------------ named loaders


@register_dataloader("classification_test_dataloader")
def classification_test_dataloader(batch_size: int = 16, image_size: Tuple[int, int] = (64, 64), dataset_size: int = 64, num_classes: int = 10, **kw) -> DataLoader:
    return DataLoader(RandomClassificationDataset(dataset_size, image_size, num_classes), batch_size=batch_size, shuffle=True)


@register_dataloader("detection_test_dataloader")
def detection_test_dataloader(batch_size: int = 8, image_size: Tuple[int, int] = (320, 320), dataset_size: int = 32, num_classes: int = 80, max_boxes: int = 20, **kw) -> DataLoader:
    return DataLoader(RandomDetectionDataset(dataset_size, image_size, num_classes, max_boxes), batch_size=batch_size, shuffle=True)


@register_dataloader("segmentation_test_dataloader")
def segmentation_test_dataloader(batch_size: int = 4, image_size: Tuple[int, int] = (128, 128), dataset_size: int = 16, num_classes: int = 19, **kw) -> DataLoader:
    return DataLoader(RandomSegmentationDataset(dataset_size, image_size, num_classes), batch_size=batch_size, shuffle=True)


def get(name: Optional[str] = None, dataset=None, dataset_params: Optional[Dict] = None, dataloader_params: Optional[Dict] = None) -> DataLoader:
    """Named-loader factory (ref dataloaders.py:889)."""
    dataset_params = dict(dataset_params or {})
    dataloader_params = dict(dataloader_params or {})
    if name is not None:
        if name not in DATALOADERS:
            raise KeyError(f"Unknown dataloader `{name}`; registered: {sorted(DATALOADERS)}")
        # a key present in both groups (e.g. batch_size from the `batch_size=`
        # recipe shortcut landing in dataloader_params while the recipe's
        # dataset_params also carries one) resolves to dataloader_params — the
        # group that owns batching in the reference's split (dataloaders.py:56-227)
        merged = {**dataset_params, **dataloader_params}
        loader = DATALOADERS[name](**merged)
        # worker/prefetch knobs apply to every named loader (ref honors
        # dataloader_params.num_workers on all of them, dataloaders.py:56-227)
        for k in ("num_workers", "prefetch_factor"):
            if k in dataloader_params and isinstance(loader, DataLoader):
                setattr(loader, k, int(dataloader_params[k]))
        return loader
    if dataset is None:
        raise ValueError("Either `name` or `dataset` must be provided")
    return DataLoader(dataset, **dataloader_params)


# ----------------------------------------------- real-data named loaders
# (reference dataloaders.py:229-887 — COCO/Cityscapes/ImageNet named factories)


def _yolo_nas_train_transforms(input_dim=(640, 640)):
    from super_gradients_tpu.training.transforms.detection import (
        DetectionHSV,
        DetectionHorizontalFlip,
        DetectionMixup,
        DetectionMosaic,
        DetectionPaddedRescale,
        DetectionRandomAffine,
        DetectionStandardize,
    )

    return [
        DetectionMosaic(input_dim=input_dim, prob=1.0),
        DetectionRandomAffine(degrees=10, translate=0.1, scales=(0.5, 1.5), shear=2.0, target_size=input_dim),
        DetectionMixup(prob=0.5),
        DetectionHSV(prob=1.0, hgain=5, sgain=30, vgain=30),
        DetectionHorizontalFlip(prob=0.5),
        DetectionPaddedRescale(input_dim=input_dim),
        DetectionStandardize(max_value=255.0),
    ]


def _yolo_nas_val_transforms(input_dim=(640, 640)):
    from super_gradients_tpu.training.transforms.detection import DetectionPaddedRescale, DetectionStandardize

    return [DetectionPaddedRescale(input_dim=input_dim), DetectionStandardize(max_value=255.0)]


@register_dataloader("coco2017_train_yolo_nas")
@register_dataloader("coco2017_train")
def coco2017_train_yolo_nas(data_dir: str, batch_size: int = 16, input_dim=(640, 640), max_boxes: int = 120,
                            subdir: str = "images/train2017", json_file: str = "instances_train2017.json", **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import COCODetectionDataset

    ds = COCODetectionDataset(
        data_dir=data_dir, subdir=subdir, json_file=json_file,
        transforms=_yolo_nas_train_transforms(tuple(input_dim)), max_boxes=max_boxes,
        ignore_empty_annotations=True,
    )
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("coco2017_val_yolo_nas")
@register_dataloader("coco2017_val")
def coco2017_val_yolo_nas(data_dir: str, batch_size: int = 32, input_dim=(640, 640), max_boxes: int = 120,
                          subdir: str = "images/val2017", json_file: str = "instances_val2017.json",
                          with_crowd: bool = True, **kw) -> DataLoader:
    """COCO val loader. ``with_crowd`` (default True, matching the reference's
    CrowdDetectionCollateFN-based val loaders) emits [B, max_boxes, 6] targets whose
    is_crowd column drives crowd-IoA handling in DetectionMetrics — required for
    pycocotools-comparable mAP."""
    from super_gradients_tpu.training.datasets import COCODetectionDataset

    ds = COCODetectionDataset(
        data_dir=data_dir, subdir=subdir, json_file=json_file,
        transforms=_yolo_nas_val_transforms(tuple(input_dim)), max_boxes=max_boxes,
        with_crowd=with_crowd,
    )
    return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False)


@register_dataloader("imagenet_train")
def imagenet_train(data_dir: str, batch_size: int = 128, image_size=(224, 224), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import ImageFolderDataset

    return DataLoader(ImageFolderDataset(data_dir, tuple(image_size)), batch_size=batch_size, shuffle=True)


@register_dataloader("imagenet_val")
def imagenet_val(data_dir: str, batch_size: int = 128, image_size=(224, 224), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import ImageFolderDataset

    return DataLoader(ImageFolderDataset(data_dir, tuple(image_size)), batch_size=batch_size, shuffle=False, drop_last=False)


@register_dataloader("segmentation_train")
@register_dataloader("cityscapes_stdc_seg50_train")
def segmentation_train(root: str, batch_size: int = 8, image_size=(512, 1024), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import SegmentationDataset

    return DataLoader(SegmentationDataset(root, image_size=tuple(image_size)), batch_size=batch_size, shuffle=True)


@register_dataloader("segmentation_val")
@register_dataloader("cityscapes_stdc_seg50_val")
def segmentation_val(root: str, batch_size: int = 8, image_size=(512, 1024), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import SegmentationDataset

    return DataLoader(SegmentationDataset(root, image_size=tuple(image_size)), batch_size=batch_size, shuffle=False, drop_last=False)


# ----------------------------------------------------------------- CIFAR loaders
# (reference dataloaders.py cifar10_train :571 / cifar10_val / cifar100_*)


@register_dataloader("cifar10_train")
def cifar10_train(root: str = "/data/cifar10", batch_size: int = 256, **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import CIFAR10Dataset

    return DataLoader(CIFAR10Dataset(root, train=True), batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("cifar10_val")
def cifar10_val(root: str = "/data/cifar10", batch_size: int = 512, **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import CIFAR10Dataset

    return DataLoader(CIFAR10Dataset(root, train=False), batch_size=batch_size, shuffle=False, drop_last=False)


# ----------------------------------------------------------------- MNIST loaders
# (ref user_recipe_mnist_example.yaml — stdlib idx-file parser, no torchvision)


class MNISTDataset:
    """MNIST idx files (train-images-idx3-ubyte[.gz] etc.) → (image [28,28,1] 0-1, label)."""

    def __init__(self, root: str, train: bool = True):
        import gzip
        import os as _os

        prefix = "train" if train else "t10k"

        def read_idx(name):
            for suffix in ("", ".gz"):
                p = _os.path.join(root, name + suffix)
                if _os.path.exists(p):
                    opener = gzip.open if suffix else open
                    with opener(p, "rb") as f:
                        data = f.read()
                    ndim = data[3]
                    dims = [int.from_bytes(data[4 + 4 * i : 8 + 4 * i], "big") for i in range(ndim)]
                    return np.frombuffer(data, np.uint8, offset=4 + 4 * ndim).reshape(dims)
            raise FileNotFoundError(f"MNIST file {name}[.gz] not found under {root}")

        self.images = read_idx(f"{prefix}-images-idx3-ubyte")
        self.labels = read_idx(f"{prefix}-labels-idx1-ubyte")

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return self.images[i][..., None].astype(np.float32) / 255.0, int(self.labels[i])


@register_dataloader("mnist_train")
def mnist_train(root: str = "/data/mnist", batch_size: int = 256, **kw) -> DataLoader:
    return DataLoader(MNISTDataset(root, train=True), batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("mnist_val")
def mnist_val(root: str = "/data/mnist", batch_size: int = 512, **kw) -> DataLoader:
    return DataLoader(MNISTDataset(root, train=False), batch_size=batch_size, shuffle=False, drop_last=False)


# -------------------------------------------------------------- Roboflow loaders
# (ref dataloaders.py roboflow_train_yolox/roboflow_val_yolox — RF100 datasets)


@register_dataloader("roboflow_train")
def roboflow_train(data_dir: str, dataset_name: str, batch_size: int = 16, image_size=(640, 640), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_roboflow import RoboflowDetectionDataset

    ds = RoboflowDetectionDataset(data_dir=data_dir, dataset_name=dataset_name, split="train",
                                  transforms=_yolo_nas_train_transforms(tuple(image_size)))
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("roboflow_val")
def roboflow_val(data_dir: str, dataset_name: str, batch_size: int = 32, image_size=(640, 640), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_roboflow import RoboflowDetectionDataset

    ds = RoboflowDetectionDataset(data_dir=data_dir, dataset_name=dataset_name, split="valid",
                                  transforms=_yolo_nas_val_transforms(tuple(image_size)))
    return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False)


@register_dataloader("cifar100_train")
def cifar100_train(root: str = "/data/cifar100", batch_size: int = 256, **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import CIFAR100Dataset

    return DataLoader(CIFAR100Dataset(root, train=True), batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("cifar100_val")
def cifar100_val(root: str = "/data/cifar100", batch_size: int = 512, **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import CIFAR100Dataset

    return DataLoader(CIFAR100Dataset(root, train=False), batch_size=batch_size, shuffle=False, drop_last=False)


# ------------------------------------------------------- detection loader family
# (reference dataloaders.py:252-340 — per-architecture COCO loaders; same datasets,
# transform stacks matched to the recipe dataset_params)


class PPYoloEMultiScaleCollate:
    """Multi-scale batch resize (ref PPYoloECollateFN random_resize_sizes).

    TPU-native: sizes cycle through a FIXED list keyed by the batch counter, so
    XLA compiles one executable per size (bounded set) instead of unbounded
    dynamic shapes.
    """

    def __init__(self, sizes=(480, 512, 544, 576, 608, 640), seed: int = 0):
        self.sizes = tuple(int(s) for s in sizes)
        self._count = seed

    def __call__(self, samples):
        import jax

        images, targets = default_collate(samples)
        self._count += 1
        size = self.sizes[self._count % len(self.sizes)]
        if images.shape[1] != size:
            scale = size / images.shape[1]
            b, h, w, c = images.shape
            out_shape = (b, size, int(round(w * scale)), c)
            images = np.asarray(jax.image.resize(images, out_shape, method="bilinear"))
            targets = targets.copy()
            targets[..., 1:5] = np.where(targets[..., 1:5] >= 0, targets[..., 1:5] * scale, targets[..., 1:5])
        return images, targets


@register_dataloader("coco2017_train_ppyoloe")
def coco2017_train_ppyoloe(data_dir: str, batch_size: int = 16, input_dim=(640, 640), max_boxes: int = 120,
                           multiscale: bool = False, subdir: str = "images/train2017",
                           json_file: str = "instances_train2017.json", **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import COCODetectionDataset

    ds = COCODetectionDataset(
        data_dir=data_dir, subdir=subdir, json_file=json_file,
        transforms=_yolo_nas_train_transforms(tuple(input_dim)), max_boxes=max_boxes,
        ignore_empty_annotations=True,
    )
    collate = PPYoloEMultiScaleCollate() if multiscale else None
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True, collate_fn=collate)


@register_dataloader("coco2017_val_ppyoloe")
def coco2017_val_ppyoloe(data_dir: str, batch_size: int = 32, input_dim=(640, 640), max_boxes: int = 120,
                         subdir: str = "images/val2017", json_file: str = "instances_val2017.json", **kw) -> DataLoader:
    return coco2017_val_yolo_nas(data_dir, batch_size, input_dim, max_boxes, subdir, json_file)


@register_dataloader("coco2017_train_yolox")
def coco2017_train_yolox(data_dir: str, batch_size: int = 16, input_dim=(640, 640), max_boxes: int = 120, **kw) -> DataLoader:
    return coco2017_train_yolo_nas(data_dir, batch_size, input_dim, max_boxes, **kw)


@register_dataloader("coco2017_val_yolox")
def coco2017_val_yolox(data_dir: str, batch_size: int = 32, input_dim=(640, 640), max_boxes: int = 120, **kw) -> DataLoader:
    return coco2017_val_yolo_nas(data_dir, batch_size, input_dim, max_boxes, **kw)


@register_dataloader("coco2017_train_ssd_lite_mobilenet_v2")
def coco2017_train_ssd(data_dir: str, batch_size: int = 32, input_dim=(320, 320), max_boxes: int = 120, **kw) -> DataLoader:
    return coco2017_train_yolo_nas(data_dir, batch_size, input_dim, max_boxes, **kw)


@register_dataloader("coco2017_val_ssd_lite_mobilenet_v2")
def coco2017_val_ssd(data_dir: str, batch_size: int = 32, input_dim=(320, 320), max_boxes: int = 120, **kw) -> DataLoader:
    return coco2017_val_yolo_nas(data_dir, batch_size, input_dim, max_boxes, **kw)


# --------------------------------------------------------- ImageNet loader family
# (reference imagenet_resnet50/efficientnet/mobilenetv2/... loaders :380-500; the
# families share the folder dataset, differing in resolution/augment strength)


def _register_imagenet_family(name: str, image_size: int):
    @register_dataloader(f"imagenet_{name}_train")
    def _train(data_dir: str, batch_size: int = 128, **kw) -> DataLoader:
        from super_gradients_tpu.training.datasets import ImageFolderDataset

        return DataLoader(ImageFolderDataset(os.path.join(data_dir, "train") if os.path.isdir(os.path.join(data_dir, "train")) else data_dir,
                                             (image_size, image_size)), batch_size=batch_size, shuffle=True)

    @register_dataloader(f"imagenet_{name}_val")
    def _val(data_dir: str, batch_size: int = 128, **kw) -> DataLoader:
        from super_gradients_tpu.training.datasets import ImageFolderDataset

        return DataLoader(ImageFolderDataset(os.path.join(data_dir, "val") if os.path.isdir(os.path.join(data_dir, "val")) else data_dir,
                                             (image_size, image_size)), batch_size=batch_size, shuffle=False, drop_last=False)

    return _train, _val


import os  # noqa: E402

for _name, _size in [("resnet50", 224), ("efficientnet", 224), ("mobilenetv2", 224), ("mobilenetv3", 224),
                     ("regnetY", 224), ("repvgg", 224), ("vit_base", 224), ("vit_large", 224)]:
    _register_imagenet_family(_name, _size)


# -------------------------------------------------------- Cityscapes loader family
# (reference cityscapes_train/val + per-arch variants :610-700)


def _cityscapes_loader(root: str, split: str, batch_size: int, image_size, shuffle: bool) -> DataLoader:
    from super_gradients_tpu.training.datasets import CityscapesDataset

    return DataLoader(
        CityscapesDataset(root=root, split=split, image_size=tuple(image_size)),
        batch_size=batch_size, shuffle=shuffle, drop_last=shuffle,
    )


def _register_cityscapes_family(name: str, train_size, val_size):
    @register_dataloader(f"cityscapes_{name}_train")
    def _train(root: str, batch_size: int = 8, image_size=None, **kw) -> DataLoader:
        return _cityscapes_loader(root, "train", batch_size, image_size or train_size, True)

    @register_dataloader(f"cityscapes_{name}_val")
    def _val(root: str, batch_size: int = 8, image_size=None, **kw) -> DataLoader:
        return _cityscapes_loader(root, "val", batch_size, image_size or val_size, False)


for _n, _ts, _vs in [("seg50", (512, 1024), (512, 1024)), ("seg75", (768, 1536), (768, 1536)),
                     ("ddrnet", (1024, 1024), (1024, 2048)), ("regseg48", (1024, 1024), (1024, 2048)),
                     ("segformer", (1024, 1024), (1024, 2048))]:
    _register_cityscapes_family(_n, _ts, _vs)


@register_dataloader("cityscapes_train")
def cityscapes_train(root: str, batch_size: int = 8, image_size=(512, 1024), **kw) -> DataLoader:
    return _cityscapes_loader(root, "train", batch_size, image_size, True)


@register_dataloader("cityscapes_val")
def cityscapes_val(root: str, batch_size: int = 8, image_size=(512, 1024), **kw) -> DataLoader:
    return _cityscapes_loader(root, "val", batch_size, image_size, False)


# ----------------------------------------------- additional segmentation loaders
# (ref dataloaders.py coco_segmentation_train, pascal_voc_segmentation_train,
#  mapillary_train, supervisely_persons_train families)


@register_dataloader("coco_segmentation_train")
def coco_segmentation_train(data_dir: str, batch_size: int = 16, image_size=(512, 512), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_segmentation import CoCoSegmentationDataset

    ds = CoCoSegmentationDataset(data_dir, subdir="images/train2017", json_file="instances_train2017.json", image_size=image_size)
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("coco_segmentation_val")
def coco_segmentation_val(data_dir: str, batch_size: int = 16, image_size=(512, 512), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_segmentation import CoCoSegmentationDataset

    ds = CoCoSegmentationDataset(data_dir, subdir="images/val2017", json_file="instances_val2017.json", image_size=image_size)
    return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False)


@register_dataloader("pascal_voc_segmentation_train")
def pascal_voc_segmentation_train(root: str, batch_size: int = 16, image_size=(512, 512), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_segmentation import PascalVOC2012SegmentationDataset

    return DataLoader(PascalVOC2012SegmentationDataset(root, "train", image_size), batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("pascal_voc_segmentation_val")
def pascal_voc_segmentation_val(root: str, batch_size: int = 16, image_size=(512, 512), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_segmentation import PascalVOC2012SegmentationDataset

    return DataLoader(PascalVOC2012SegmentationDataset(root, "val", image_size), batch_size=batch_size, shuffle=False, drop_last=False)


@register_dataloader("mapillary_train")
def mapillary_train(root_dir: str, batch_size: int = 8, image_size=(512, 512), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_segmentation import MapillaryDataset

    ds = MapillaryDataset(root_dir, samples_sub_directory="training/images", targets_sub_directory="training/v1.2/labels", image_size=image_size)
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("mapillary_val")
def mapillary_val(root_dir: str, batch_size: int = 8, image_size=(512, 512), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_segmentation import MapillaryDataset

    ds = MapillaryDataset(root_dir, samples_sub_directory="validation/images", targets_sub_directory="validation/v1.2/labels", image_size=image_size)
    return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False)


@register_dataloader("supervisely_persons_train")
def supervisely_persons_train(root_dir: str, batch_size: int = 16, image_size=(480, 320), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_segmentation import SuperviselyPersonsDataset

    return DataLoader(SuperviselyPersonsDataset(root_dir, "train.csv", image_size), batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("supervisely_persons_val")
def supervisely_persons_val(root_dir: str, batch_size: int = 16, image_size=(480, 320), **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets_segmentation import SuperviselyPersonsDataset

    return DataLoader(SuperviselyPersonsDataset(root_dir, "val.csv", image_size), batch_size=batch_size, shuffle=False, drop_last=False)


# ------------------------------------------------------------- COCO pose loaders
# (reference coco2017_pose_train/val :700-780)


def _pose_transforms(image_size, train: bool):
    from super_gradients_tpu.training.transforms.keypoints import (
        KeypointsHorizontalFlip,
        KeypointsLongestMaxSize,
        KeypointsPadIfNeeded,
        KeypointsStandardize,
    )

    ts = [KeypointsLongestMaxSize(max_height=image_size[0], max_width=image_size[1]),
          KeypointsPadIfNeeded(min_height=image_size[0], min_width=image_size[1]),
          KeypointsStandardize(max_value=255.0)]
    if train:
        ts.insert(0, KeypointsHorizontalFlip(prob=0.5))
    return ts


@register_dataloader("coco2017_pose_train")
def coco2017_pose_train(data_dir: str, batch_size: int = 16, image_size=(640, 640), max_poses: int = 30,
                        json_file: str = "person_keypoints_train2017.json", subdir: str = "images/train2017", **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import COCOPoseEstimationDataset

    ds = COCOPoseEstimationDataset(data_dir=data_dir, json_annotation_file=json_file, images_dir=subdir,
                                   max_poses=max_poses, transforms=_pose_transforms(tuple(image_size), True))
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True)


@register_dataloader("coco2017_pose_val")
def coco2017_pose_val(data_dir: str, batch_size: int = 32, image_size=(640, 640), max_poses: int = 30,
                      json_file: str = "person_keypoints_val2017.json", subdir: str = "images/val2017", **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import COCOPoseEstimationDataset

    ds = COCOPoseEstimationDataset(data_dir=data_dir, json_annotation_file=json_file, images_dir=subdir,
                                   max_poses=max_poses, transforms=_pose_transforms(tuple(image_size), False))
    return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False)


# ------------------------------------------------------------- DEKR dense-target loaders
# (reference coco2017_pose_dekr_train :700, KeypointsCollate + DEKRTargetsGenerator)


class DEKRTargetsDataset:
    """Wrap a pose dataset (image, padded [max_poses, 5+3K] rows) with dense DEKR
    target rendering (ref DEKRTargetsGenerator via dataset ``target_generator=``)."""

    def __init__(self, base, num_joints: int = 17, target_generator=None):
        from super_gradients_tpu.training.pose_targets import DEKRTargetsGenerator

        self.base = base
        self.num_joints = num_joints
        self.target_generator = target_generator or DEKRTargetsGenerator()

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        from super_gradients_tpu.training.pose_targets import padded_pose_targets_to_joints

        image, padded = self.base[i]
        joints, _ = padded_pose_targets_to_joints(padded, self.num_joints)
        targets = self.target_generator(image.shape[:2], joints if len(joints) else np.zeros((0, self.num_joints, 3), np.float32))
        return (image, *targets)


def dekr_collate(samples: Sequence[Tuple]) -> Tuple:
    """(image, hm, mask, off, ow) rows -> (images, (hm, mask, off, ow)) batch — the
    trainer ships batch[1] as a pytree of dense targets."""
    cols = list(zip(*samples))
    stacked = [np.stack([np.asarray(s) for s in col]) for col in cols]
    return stacked[0], tuple(stacked[1:])


@register_dataloader("coco2017_pose_dekr_train")
def coco2017_pose_dekr_train(data_dir: str, batch_size: int = 16, image_size=(640, 640), max_poses: int = 30,
                             num_joints: int = 17, output_stride: int = 4,
                             json_file: str = "person_keypoints_train2017.json", subdir: str = "images/train2017",
                             **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import COCOPoseEstimationDataset
    from super_gradients_tpu.training.pose_targets import DEKRTargetsGenerator

    base = COCOPoseEstimationDataset(data_dir=data_dir, json_annotation_file=json_file, images_dir=subdir,
                                     max_poses=max_poses, transforms=_pose_transforms(tuple(image_size), True))
    ds = DEKRTargetsDataset(base, num_joints=num_joints, target_generator=DEKRTargetsGenerator(output_stride=output_stride))
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True, collate_fn=dekr_collate)


@register_dataloader("coco2017_pose_dekr_val")
def coco2017_pose_dekr_val(data_dir: str, batch_size: int = 32, image_size=(640, 640), max_poses: int = 30,
                           num_joints: int = 17, output_stride: int = 4,
                           json_file: str = "person_keypoints_val2017.json", subdir: str = "images/val2017",
                           **kw) -> DataLoader:
    from super_gradients_tpu.training.datasets import COCOPoseEstimationDataset
    from super_gradients_tpu.training.pose_targets import DEKRTargetsGenerator

    base = COCOPoseEstimationDataset(data_dir=data_dir, json_annotation_file=json_file, images_dir=subdir,
                                     max_poses=max_poses, transforms=_pose_transforms(tuple(image_size), False))
    ds = DEKRTargetsDataset(base, num_joints=num_joints, target_generator=DEKRTargetsGenerator(output_stride=output_stride))
    return DataLoader(ds, batch_size=batch_size, shuffle=False, drop_last=False, collate_fn=dekr_collate)


@register_dataloader("dekr_test_dataloader")
def dekr_test_dataloader(batch_size: int = 4, image_size: Tuple[int, int] = (64, 64), dataset_size: int = 8,
                         num_joints: int = 17, output_stride: int = 4, **kw) -> DataLoader:
    ds = DEKRTargetsDataset(RandomPoseDataset(dataset_size, image_size, num_joints), num_joints=num_joints)
    from super_gradients_tpu.training.pose_targets import DEKRTargetsGenerator

    ds.target_generator = DEKRTargetsGenerator(output_stride=output_stride)
    return DataLoader(ds, batch_size=batch_size, shuffle=True, drop_last=True, collate_fn=dekr_collate)


# register rescoring loaders (module imports DataLoader from here, so import last)
from super_gradients_tpu.training import datasets_rescoring  # noqa: E402,F401
