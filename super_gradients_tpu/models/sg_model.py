"""SgModel — the stateful model wrapper around a pure flax module + variables.

Reference parity: ``SgModule`` (``training/models/sg_module.py:9-80``) + the
``HasPredict`` capability (``module_interfaces/module_interfaces.py:23``) + the predict
pipelines (``training/pipelines/pipelines.py``). In the functional TPU design the
*module* stays pure (init/apply); SgModel owns the variables pytree, processing
params, and the cached jitted predict programs.

The fused predict program (preprocess-on-device → forward → decode → NMS) compiles to
ONE XLA executable per (batch, height, width) — the north-star replacement for the
reference's per-image Python loop (``pipelines.py:195-216``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.xla_tuning import tuned_jit
from super_gradients_tpu.inference.media import images_to_list
from super_gradients_tpu.inference.prediction_results import (
    ClassificationPrediction,
    DetectionPrediction,
    ImagesPredictions,
    PoseEstimationPrediction,
    SegmentationPrediction,
)
from super_gradients_tpu.inference.processing import ComposeProcessing, Processing
from super_gradients_tpu.ops.nms import NMSOutput, batched_nms

logger = get_logger(__name__)


class SgModel:
    """A flax module + its variables + task metadata, with a predict() surface."""

    task: str = "generic"

    def __init__(
        self,
        name: str,
        module: Any,
        variables: Dict,
        num_classes: Optional[int] = None,
        config: Any = None,
        processing: Optional[Processing] = None,
        class_names: Optional[List[str]] = None,
        input_hw: Tuple[int, int] = (224, 224),
    ):
        self.name = name
        self.module = module
        self.variables = variables
        self.num_classes = num_classes
        self.config = config
        self._processing = processing
        self._class_names = class_names
        self._input_hw = tuple(input_hw)
        self._predict_cache: Dict = {}

    # ----------------------------------------------------------------- basics

    @property
    def params(self):
        return self.variables.get("params", {})

    @property
    def batch_stats(self):
        return self.variables.get("batch_stats", {})

    def __call__(self, x, train: bool = False, **kwargs):
        return self.apply(x, train=train, **kwargs)

    def apply(self, x, train: bool = False, mutable: Optional[Sequence[str]] = None, rngs=None, **kwargs):
        if train and mutable is None:
            mutable = ["batch_stats"] if "batch_stats" in self.variables else []
        if train and rngs is None:
            rngs = {"dropout": jax.random.PRNGKey(0)}
        if mutable:
            return self.module.apply(self.variables, x, train=train, mutable=mutable, rngs=rngs, **kwargs)
        return self.module.apply(self.variables, x, train=train, rngs=rngs, **kwargs)

    def update_variables(self, variables: Dict):
        self.variables = variables
        self._predict_cache.clear()
        self.__dict__.pop("_infer_cache", None)

    def num_params(self) -> int:
        return sum(int(p.size) for p in jax.tree_util.tree_leaves(self.params))

    def replace_head(self, new_num_classes: int, seed: int = 0) -> "SgModel":
        """Weight-preserving head swap (ref SgModule.replace_head, sg_module.py:9-80):
        backbone/neck weights stay bit-identical; only class-dependent head tensors
        are re-initialized. Returns a NEW model."""
        from super_gradients_tpu.models.model_factory import replace_head

        return replace_head(self, new_num_classes, seed=seed)

    # -------------------------------------------------- processing params API
    # (reference HasPreprocessingParams / set_dataset_processing_params)

    def set_dataset_processing_params(
        self,
        class_names: Optional[List[str]] = None,
        image_processor: Optional[Processing] = None,
        conf: Optional[float] = None,
        iou: Optional[float] = None,
        edge_links=None,
        edge_colors=None,
        keypoint_colors=None,
        **kwargs,
    ):
        """Attach dataset-derived inference params (ref HasPredict.set_dataset_processing_params:
        class names, preprocessing pipeline, NMS conf/iou defaults, pose skeleton)."""
        if class_names is not None:
            self._class_names = list(class_names)
        if image_processor is not None:
            self._processing = image_processor
        if conf is not None:
            self._default_nms_conf = float(conf)
        if iou is not None:
            self._default_nms_iou = float(iou)
        if edge_links is not None:
            self._edge_links = edge_links
        if edge_colors is not None:
            self._edge_colors = edge_colors
        if keypoint_colors is not None:
            self._keypoint_colors = keypoint_colors
        self._predict_cache.clear()

    def get_processing_params(self) -> Optional[Processing]:
        return self._processing

    @property
    def class_names(self):
        return self._class_names

    def predict(self, images, **kwargs):
        raise NotImplementedError(f"predict() is not implemented for task `{self.task}`")

    def export(self, output_path: str, **kwargs):
        """Serialize the fused inference program to a StableHLO artifact
        (ref ExportableObjectDetectionModel.export / ExportablePoseEstimationModel /
        ExportableSegmentationModel — one ``model.export(path)`` per task)."""
        from super_gradients_tpu.conversion import export as export_mod

        fn = {
            "detection": export_mod.export_detection_model,
            "pose_estimation": export_mod.export_pose_estimation_model,
            "segmentation": export_mod.export_segmentation_model,
        }.get(self.task)
        if fn is None:
            raise NotImplementedError(f"export() is not supported for task `{self.task}`")
        return fn(self, output_path, **kwargs)

    def predict_video(self, video_path: str, batch_size: int = 32, max_frames: Optional[int] = None, **kwargs):
        """Per-frame predict over a video file (ref pipelines.py predict_video).

        Frames stream lazily from disk in ``batch_size`` chunks through the same
        fused predict program as images; returns :class:`VideoPredictions` whose
        ``save()`` re-renders the annotated video at the source FPS.
        """
        from super_gradients_tpu.inference.prediction_results import VideoPredictions
        from super_gradients_tpu.inference.video import lazy_load_video

        frames, fps, _ = lazy_load_video(video_path, max_frames)
        preds: list = []
        buf: list = []
        for f in frames:
            buf.append(f)
            if len(buf) == batch_size:
                preds.extend(list(self.predict(buf, batch_size=batch_size, **kwargs)))
                buf = []
        if buf:
            preds.extend(list(self.predict(buf, batch_size=batch_size, **kwargs)))
        return VideoPredictions(preds, fps)

    def predict_webcam(self, capture: int = 0, **kwargs) -> None:
        """Live webcam predict+draw loop, `q` to quit (ref pipelines.py predict_webcam
        + media/stream.py WebcamStreaming)."""
        from super_gradients_tpu.inference.stream import WebcamStreaming

        def process(frame):
            return self.predict([frame], batch_size=1, **kwargs)[0].draw()

        WebcamStreaming(window_name=f"{type(self).__name__} predictions",
                        frame_processing_fn=process).run()

    # --------------------------------------------------------------- internal

    def _prep_host_batches(self, images, batch_size: int):
        """Host-side: load + geometric preprocess each image; group into batches."""
        image_list = images_to_list(images)
        processed, metas = [], []
        for img in image_list:
            if self._processing is not None:
                out, meta = self._processing.preprocess_image(img)
            else:
                out, meta = img, None
            processed.append(np.asarray(out, dtype=np.float32))
            metas.append(meta)
        batches = []
        for i in range(0, len(processed), batch_size):
            chunk = processed[i : i + batch_size]
            n = len(chunk)
            if n < batch_size:  # pad to static batch for jit-cache friendliness
                chunk = chunk + [np.zeros_like(chunk[0])] * (batch_size - n)
            batches.append((np.stack(chunk), n))
        return image_list, batches, metas


class DetectionModel(SgModel):
    """Detection task wrapper: fused forward+decode+NMS predict program."""

    task = "detection"

    def fuse(self) -> "DetectionModel":
        """Reparameterize every QARepVGG block to deploy form (single 3x3 conv).

        Analogue of the reference's ``fuse_model=True`` predict path /
        ``prep_model_for_conversion`` (customizable_detector.py:106). Returns a NEW
        DetectionModel with ``config.fused='full'`` and fused params.
        """
        import dataclasses

        from super_gradients_tpu.modules.blocks import fuse_all_qarepvgg

        # configs without a `fused` field (e.g. YOLOX) have no reparam blocks — no-op
        if self.config is None or getattr(self.config, "fused", None) != "none":
            return self
        with jax.default_device(jax.devices("cpu")[0]):  # fusion math on host
            fused_params, fused_stats = fuse_all_qarepvgg(
                jax.device_get(self.params), jax.device_get(self.batch_stats), bn_eps=self.config.bn_eps
            )
        cfg = dataclasses.replace(self.config, fused="full")
        module = type(self.module)(cfg)
        variables = {"params": fused_params}
        if fused_stats:
            variables["batch_stats"] = fused_stats
        out = DetectionModel(
            name=self.name + "_fused",
            module=module,
            variables=variables,
            num_classes=self.num_classes,
            config=cfg,
            processing=self._processing,
            class_names=self._class_names,
            input_hw=self._input_hw,
        )
        return out

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        # defaults mirror CustomizableDetector (customizable_detector.py:84-92)
        self._default_nms_iou = 0.7
        self._default_nms_conf = 0.25
        self._default_nms_top_k = 1024
        self._default_max_predictions = 300
        self._default_multi_label_per_box = True
        self._default_class_agnostic_nms = False

    def _infer_module_and_vars(self, fuse_model: bool, bf16: bool, stem_s2d: bool = False, input_scale: float = None):
        """Deploy form of the net: optionally QARepVGG-fused and bf16-cast.

        Mirrors the reference predict defaults (fuse_model=True, fp16=True on CUDA —
        bf16 is the TPU analogue; decode/NMS stay fp32 inside the model heads).

        ``stem_s2d`` rewrites the stem to the space-to-depth form (MXU-lane-filling,
        bit-equivalent — see :func:`yolo_nas.s2d_stem_params`); ``input_scale``
        folds an input standardization (e.g. 1/255) into the stem weights so the
        program consumes raw uint8 frames. Both require fuse_model=True and a
        YoloNAS-family config.
        """
        key = (fuse_model, bf16, stem_s2d, input_scale)
        cache = self.__dict__.setdefault("_infer_cache", {})
        if key not in cache:
            src = self.fuse() if fuse_model else self
            module, variables = src.module, src.variables
            if stem_s2d or input_scale is not None:
                import dataclasses as _dc

                from super_gradients_tpu.models.detection.yolo_nas import s2d_stem_params

                if not hasattr(src.config, "stem_s2d"):
                    raise ValueError(f"stem_s2d/input_scale not supported for {type(src.config).__name__}")
                if not stem_s2d:
                    raise ValueError("input_scale folding currently requires stem_s2d=True")
                cfg = _dc.replace(src.config, stem_s2d=True)
                module = type(src.module)(cfg)
                variables = {**variables, "params": s2d_stem_params(variables["params"], input_scale)}
            if bf16:
                variables = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                    variables,
                )
            cache[key] = (module, variables)
        return cache[key]

    def _predict_program(self, conf, iou, nms_top_k, max_predictions, multi_label, class_agnostic, nms_mode,
                         fuse_model=True, bf16=True, prefilter="two_stage"):
        """One jitted program: [B,H,W,3] float (0..255-standardized already) → NMSOutput."""

        module, variables = self._infer_module_and_vars(fuse_model, bf16)
        in_dtype = jnp.bfloat16 if bf16 else jnp.float32

        @tuned_jit
        def program(images: jnp.ndarray) -> NMSOutput:
            outputs = module.apply(variables, images.astype(in_dtype), train=False)
            # For heads whose pred_scores == sigmoid(cls_logits.astype(f32))
            # (YOLO-NAS / PP-YOLOE), NMS prefilters on the raw logit map and
            # sigmoids only the gathered candidates — identical outputs up to
            # ordering within saturated-score ties (see ops/nms.py), and XLA
            # DCEs the full-map fp32 sigmoid. conversion/export.py mirrors this
            # so live and exported programs match candidate-for-candidate.
            # YoloNASOutputs IS that contract (PP-YOLOE returns it too); YoloX
            # (obj*cls product) and SSD (softmax) keep the score-map path.
            use_logits = type(outputs).__name__ == "YoloNASOutputs"
            scores = outputs.cls_logits if use_logits else outputs.pred_scores
            return batched_nms(
                outputs.pred_bboxes,
                scores,
                score_threshold=conf,
                iou_threshold=iou,
                nms_top_k=nms_top_k,
                max_predictions=max_predictions,
                multi_label=multi_label,
                class_agnostic=class_agnostic,
                mode=nms_mode,
                prefilter=prefilter,
                scores_are_logits=use_logits,
            )

        return program

    def predict(
        self,
        images,
        iou: Optional[float] = None,
        conf: Optional[float] = None,
        batch_size: int = 8,
        max_predictions: Optional[int] = None,
        nms_top_k: Optional[int] = None,
        multi_label_per_box: Optional[bool] = None,
        class_agnostic_nms: Optional[bool] = None,
        nms_mode: str = "exact",
        fuse_model: bool = True,
        bf16: bool = True,
        nms_prefilter: str = "two_stage",
    ) -> ImagesPredictions:
        """Run the fused predict pipeline (ref ``model.predict``,
        customizable_detector.py:281-323 + pipelines.py:102-236).

        ``nms_prefilter``: "two_stage" (fast per-anchor class_top_k candidate
        selection) or "flat" (the reference's exact candidate set — single
        top-k over all (anchor, class) pairs)."""
        from super_gradients_tpu.inference.video import includes_video_extension

        if isinstance(images, str) and includes_video_extension(images):
            return self.predict_video(
                images, batch_size=batch_size, iou=iou, conf=conf,
                max_predictions=max_predictions, nms_top_k=nms_top_k,
                multi_label_per_box=multi_label_per_box, class_agnostic_nms=class_agnostic_nms,
                nms_mode=nms_mode, fuse_model=fuse_model, bf16=bf16,
            )
        iou = iou if iou is not None else self._default_nms_iou
        conf = conf if conf is not None else self._default_nms_conf
        max_predictions = max_predictions or self._default_max_predictions
        nms_top_k = nms_top_k or self._default_nms_top_k
        multi_label = self._default_multi_label_per_box if multi_label_per_box is None else multi_label_per_box
        class_agnostic = self._default_class_agnostic_nms if class_agnostic_nms is None else class_agnostic_nms

        image_list, batches, metas = self._prep_host_batches(images, batch_size)

        key = ("det", conf, iou, nms_top_k, max_predictions, multi_label, class_agnostic, nms_mode, fuse_model, bf16, nms_prefilter)
        if key not in self._predict_cache:
            self._predict_cache[key] = self._predict_program(
                conf, iou, nms_top_k, max_predictions, multi_label, class_agnostic, nms_mode, fuse_model, bf16, nms_prefilter
            )
        program = self._predict_cache[key]

        predictions: List[DetectionPrediction] = []
        img_idx = 0
        for batch, n_valid in batches:
            out: NMSOutput = program(jnp.asarray(batch))
            boxes = np.asarray(out.boxes)
            scores = np.asarray(out.scores)
            labels = np.asarray(out.labels)
            nums = np.asarray(out.num_detections)
            for j in range(n_valid):
                n = int(nums[j])
                b = boxes[j, :n]
                meta = metas[img_idx]
                if meta is not None and self._processing is not None:
                    b = self._processing.postprocess_boxes(b.copy(), meta)
                h, w = image_list[img_idx].shape[:2]
                b[:, 0::2] = np.clip(b[:, 0::2], 0, w)
                b[:, 1::2] = np.clip(b[:, 1::2], 0, h)
                predictions.append(
                    DetectionPrediction(
                        bboxes_xyxy=b,
                        confidence=scores[j, :n],
                        labels=labels[j, :n],
                        class_names=self._class_names,
                        image=image_list[img_idx],
                    )
                )
                img_idx += 1
        return ImagesPredictions(predictions)

    def predict_batch_tensor(self, images: jnp.ndarray, **kwargs) -> NMSOutput:
        """Raw fused path for uniform pre-sized input [B,H,W,3] (bench/serving)."""
        key = (
            "det",
            kwargs.get("conf", self._default_nms_conf),
            kwargs.get("iou", self._default_nms_iou),
            kwargs.get("nms_top_k", self._default_nms_top_k),
            kwargs.get("max_predictions", self._default_max_predictions),
            kwargs.get("multi_label_per_box", self._default_multi_label_per_box),
            kwargs.get("class_agnostic_nms", self._default_class_agnostic_nms),
            kwargs.get("nms_mode", "exact"),
            kwargs.get("fuse_model", True),
            kwargs.get("bf16", True),
        )
        if key not in self._predict_cache:
            self._predict_cache[key] = self._predict_program(*key[1:])
        return self._predict_cache[key](images)


class ClassificationModel(SgModel):
    task = "classification"

    def predict(self, images, batch_size: int = 32, top_k: int = 5) -> ImagesPredictions:
        image_list, batches, metas = self._prep_host_batches(images, batch_size)

        if "cls" not in self._predict_cache:
            variables, module = self.variables, self.module

            @tuned_jit
            def program(x):
                logits = module.apply(variables, x, train=False)
                return jax.nn.softmax(logits, axis=-1)

            self._predict_cache["cls"] = program

        program = self._predict_cache["cls"]
        preds: List[ClassificationPrediction] = []
        img_idx = 0
        for batch, n_valid in batches:
            probs = np.asarray(program(jnp.asarray(batch)))
            for j in range(n_valid):
                order = np.argsort(-probs[j])[:top_k]
                preds.append(
                    ClassificationPrediction(
                        confidence=probs[j][order],
                        labels=order,
                        class_names=self._class_names,
                        image=image_list[img_idx],
                    )
                )
                img_idx += 1
        return ImagesPredictions(preds)


class SegmentationModel(SgModel):
    task = "segmentation"

    def predict(self, images, batch_size: int = 4) -> ImagesPredictions:
        image_list, batches, metas = self._prep_host_batches(images, batch_size)
        if "seg" not in self._predict_cache:
            variables, module = self.variables, self.module

            @tuned_jit
            def program(x):
                logits = module.apply(variables, x, train=False)
                return jnp.argmax(logits, axis=-1)

            self._predict_cache["seg"] = program
        program = self._predict_cache["seg"]
        preds: List[SegmentationPrediction] = []
        img_idx = 0
        for batch, n_valid in batches:
            maps = np.asarray(program(jnp.asarray(batch)))
            for j in range(n_valid):
                seg = maps[j]
                h, w = image_list[img_idx].shape[:2]
                meta = metas[img_idx]
                if meta is not None and self._processing is not None:
                    # undo padding+rescale through the processing pipeline
                    # (ref SegmentationResizeWithPadding.postprocess_predictions)
                    seg = self._processing.postprocess_segmentation(seg, meta)
                if seg.shape != (h, w):  # fallback: plain resize back to original
                    from PIL import Image

                    seg = np.asarray(Image.fromarray(seg.astype(np.uint8)).resize((w, h), Image.NEAREST))
                preds.append(
                    SegmentationPrediction(segmentation_map=seg, class_names=self._class_names, image=image_list[img_idx])
                )
                img_idx += 1
        return ImagesPredictions(preds)


class PoseEstimationModel(SgModel):
    """Pose task wrapper: fused forward+decode+pose-NMS predict program
    (ref PoseEstimationPipeline, pipelines.py:398)."""

    task = "pose_estimation"

    def __init__(self, *args, edge_links=None, **kwargs):
        super().__init__(*args, **kwargs)
        self._edge_links = edge_links
        self._edge_colors = None
        self._keypoint_colors = None
        self._default_nms_conf = 0.5
        self._default_nms_iou = 0.7
        self._default_pre_nms_max_predictions = 1024
        self._default_post_nms_max_predictions = 30

    def predict(
        self,
        images,
        conf: Optional[float] = None,
        iou: Optional[float] = None,
        batch_size: int = 8,
        max_predictions: Optional[int] = None,
        pre_nms_max_predictions: Optional[int] = None,
        nms_mode: str = "exact",
        bf16: bool = True,
    ) -> ImagesPredictions:
        from super_gradients_tpu.ops.nms import batched_pose_nms

        conf = conf if conf is not None else self._default_nms_conf
        iou = iou if iou is not None else self._default_nms_iou
        max_predictions = max_predictions or self._default_post_nms_max_predictions
        nms_top_k = pre_nms_max_predictions or self._default_pre_nms_max_predictions

        image_list, batches, metas = self._prep_host_batches(images, batch_size)
        key = ("pose", conf, iou, nms_top_k, max_predictions, nms_mode, bf16)
        if key not in self._predict_cache:
            variables = self.variables
            if bf16:
                variables = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                    variables,
                )
            module = self.module
            in_dtype = jnp.bfloat16 if bf16 else jnp.float32

            @tuned_jit
            def program(imgs):
                out = module.apply(variables, imgs.astype(in_dtype), train=False)
                return batched_pose_nms(
                    out.pred_bboxes,
                    out.pred_scores,
                    out.pred_pose_coords,
                    out.pred_pose_scores,
                    score_threshold=conf,
                    iou_threshold=iou,
                    nms_top_k=nms_top_k,
                    max_predictions=max_predictions,
                    mode=nms_mode,
                )

            self._predict_cache[key] = program
        program = self._predict_cache[key]

        preds: List[PoseEstimationPrediction] = []
        img_idx = 0
        for batch, n_valid in batches:
            out = program(jnp.asarray(batch))
            poses = np.asarray(out.poses)
            boxes = np.asarray(out.boxes)
            scores = np.asarray(out.scores)
            nums = np.asarray(out.num_detections)
            for j in range(n_valid):
                n = int(nums[j])
                pj, bj = poses[j, :n].copy(), boxes[j, :n].copy()
                meta = metas[img_idx]
                if meta is not None and self._processing is not None:
                    pj = self._processing.postprocess_keypoints(pj, meta)
                    bj = self._processing.postprocess_boxes(bj, meta)
                preds.append(
                    PoseEstimationPrediction(
                        poses=pj,
                        scores=scores[j, :n],
                        bboxes_xyxy=bj,
                        edge_links=self._edge_links,
                        edge_colors=self._edge_colors,
                        keypoint_colors=self._keypoint_colors,
                        image=image_list[img_idx],
                    )
                )
                img_idx += 1
        return ImagesPredictions(preds)

    def predict_batch_tensor(self, images, conf: Optional[float] = None, iou: Optional[float] = None,
                             nms_top_k: Optional[int] = None, max_predictions: Optional[int] = None,
                             nms_mode: str = "exact", bf16: bool = True):
        """Raw fused pose path for uniform pre-sized input [B,H,W,3] float 0-1
        (bench/serving/rescoring-data generation). Returns :class:`PoseNMSOutput`."""
        from super_gradients_tpu.ops.nms import batched_pose_nms

        conf = conf if conf is not None else self._default_nms_conf
        iou = iou if iou is not None else self._default_nms_iou
        nms_top_k = nms_top_k or self._default_pre_nms_max_predictions
        max_predictions = max_predictions or self._default_post_nms_max_predictions
        key = ("pose_raw", conf, iou, nms_top_k, max_predictions, nms_mode, bf16)
        if key not in self._predict_cache:
            variables = self.variables
            if bf16:
                variables = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                    variables,
                )
            module = self.module
            in_dtype = jnp.bfloat16 if bf16 else jnp.float32

            @tuned_jit
            def program(imgs):
                out = module.apply(variables, imgs.astype(in_dtype), train=False)
                return batched_pose_nms(
                    out.pred_bboxes,
                    out.pred_scores,
                    out.pred_pose_coords,
                    out.pred_pose_scores,
                    score_threshold=conf, iou_threshold=iou,
                    nms_top_k=nms_top_k, max_predictions=max_predictions, mode=nms_mode,
                )

            self._predict_cache[key] = program
        return self._predict_cache[key](jnp.asarray(images))
