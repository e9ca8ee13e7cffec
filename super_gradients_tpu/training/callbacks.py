"""Phase-callback system.

Reference parity: ``training/utils/callbacks/base_callbacks.py`` — ``Phase`` enum
(:13), ``PhaseContext`` blackboard (:36), ``Callback`` with on_* events (:112-880),
``CallbackHandler`` (:973). Callbacks run OUTSIDE the jitted step (SURVEY §7): they
receive device scalars already fetched to host, never tensors mid-graph.
"""

from __future__ import annotations

import enum
import time
from typing import Any, Dict, List, Optional, Sequence

import jax

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.registry import register_callback

logger = get_logger(__name__)


class Phase(str, enum.Enum):
    PRE_TRAINING = "PRE_TRAINING"
    TRAIN_EPOCH_START = "TRAIN_EPOCH_START"
    TRAIN_BATCH_START = "TRAIN_BATCH_START"
    TRAIN_BATCH_END = "TRAIN_BATCH_END"
    TRAIN_EPOCH_END = "TRAIN_EPOCH_END"
    VALIDATION_EPOCH_START = "VALIDATION_EPOCH_START"
    VALIDATION_BATCH_END = "VALIDATION_BATCH_END"
    VALIDATION_EPOCH_END = "VALIDATION_EPOCH_END"
    TEST_EPOCH_END = "TEST_EPOCH_END"
    POST_TRAINING = "POST_TRAINING"


class PhaseContext:
    """Mutable blackboard handed to every callback (ref base_callbacks.py:36)."""

    def __init__(self, **kwargs):
        self.epoch: int = 0
        self.batch_idx: int = 0
        self.step: int = 0
        self.metrics_dict: Dict[str, float] = {}
        self.loss_avg: Optional[float] = None
        self.lr: Optional[float] = None
        self.train_state = None
        self.trainer = None
        self.model = None
        self.stop_training: bool = False
        self.training_params: Dict = {}
        self.experiment_name: str = ""
        self.ckpt_dir: Optional[str] = None
        self.valid_metrics: Dict[str, float] = {}
        self.train_loader = None
        self.valid_loader = None
        self.sg_logger = None
        self.valid_batch = None  # host-side (inputs, targets) of the current val batch
        self.train_batch = None  # host-side (inputs, targets) of the current train batch
        self.step_metrics = None  # device dict from the last train step (sync on read)
        self._criterion_updates: Dict[str, Any] = {}
        self.__dict__.update(kwargs)

    def update_context(self, **kwargs):
        self.__dict__.update(kwargs)

    def update_criterion_params(self, **kwargs):
        """Request a loss rebuild with changed criterion_params (applied by the
        Trainer at the next epoch start — the jitted train step is re-compiled).
        Used by training-stage-switch callbacks (ref callbacks.py:722,
        ppyoloe_switch_callback.py:7)."""
        self._criterion_updates.update(kwargs)


class Callback:
    """Subscribe to phase events (ref Callback, base_callbacks.py:112)."""

    def on_training_start(self, context: PhaseContext):
        pass

    def on_train_loader_start(self, context: PhaseContext):
        pass

    def on_train_batch_start(self, context: PhaseContext):
        pass

    def on_train_batch_end(self, context: PhaseContext):
        pass

    def on_train_loader_end(self, context: PhaseContext):
        pass

    def on_validation_loader_start(self, context: PhaseContext):
        pass

    def on_validation_batch_end(self, context: PhaseContext):
        pass

    def on_validation_loader_end(self, context: PhaseContext):
        pass

    def on_test_loader_end(self, context: PhaseContext):
        pass

    def on_training_end(self, context: PhaseContext):
        pass


class PhaseCallback(Callback):
    """Legacy single-phase callback (ref base_callbacks.py:884)."""

    def __init__(self, phase: Phase):
        self.phase = phase

    def __call__(self, context: PhaseContext):
        pass

    _PHASE_TO_EVENT = {
        Phase.PRE_TRAINING: "on_training_start",
        Phase.TRAIN_EPOCH_START: "on_train_loader_start",
        Phase.TRAIN_BATCH_START: "on_train_batch_start",
        Phase.TRAIN_BATCH_END: "on_train_batch_end",
        Phase.TRAIN_EPOCH_END: "on_train_loader_end",
        Phase.VALIDATION_EPOCH_START: "on_validation_loader_start",
        Phase.VALIDATION_BATCH_END: "on_validation_batch_end",
        Phase.VALIDATION_EPOCH_END: "on_validation_loader_end",
        Phase.TEST_EPOCH_END: "on_test_loader_end",
        Phase.POST_TRAINING: "on_training_end",
    }

    def __getattribute__(self, name):
        if name.startswith("on_"):
            phase = object.__getattribute__(self, "phase")
            event = PhaseCallback._PHASE_TO_EVENT.get(phase)
            if name == event:
                return object.__getattribute__(self, "__call__")
        return object.__getattribute__(self, name)


class CallbackHandler(Callback):
    """Fan-out to a list of callbacks (ref base_callbacks.py:973)."""

    def __init__(self, callbacks: Sequence[Callback]):
        self.callbacks = list(callbacks)

    def _fan(self, event: str, context: PhaseContext):
        for cb in self.callbacks:
            getattr(cb, event)(context)

    def on_training_start(self, c):
        self._fan("on_training_start", c)

    def on_train_loader_start(self, c):
        self._fan("on_train_loader_start", c)

    def on_train_batch_start(self, c):
        self._fan("on_train_batch_start", c)

    def on_train_batch_end(self, c):
        self._fan("on_train_batch_end", c)

    def on_train_loader_end(self, c):
        self._fan("on_train_loader_end", c)

    def on_validation_loader_start(self, c):
        self._fan("on_validation_loader_start", c)

    def on_validation_batch_end(self, c):
        self._fan("on_validation_batch_end", c)

    def on_validation_loader_end(self, c):
        self._fan("on_validation_loader_end", c)

    def on_test_loader_end(self, c):
        self._fan("on_test_loader_end", c)

    def on_training_end(self, c):
        self._fan("on_training_end", c)


@register_callback("EarlyStop")
class EarlyStop(Callback):
    """Stop when a watched metric stops improving (ref utils/early_stopping.py:15)."""

    def __init__(self, phase: str = "VALIDATION_EPOCH_END", monitor: str = "Accuracy", mode: str = "max",
                 patience: int = 3, min_delta: float = 0.0, check_finite: bool = True, verbose: bool = False):
        self.monitor = monitor
        self.mode = mode
        self.patience = patience
        self.min_delta = min_delta
        self.check_finite = check_finite
        self.verbose = verbose
        self.best: Optional[float] = None
        self.count = 0

    def on_validation_loader_end(self, context: PhaseContext):
        value = context.valid_metrics.get(self.monitor)
        if value is None:
            return
        import math

        if self.check_finite and not math.isfinite(value):
            context.stop_training = True
            return
        improved = self.best is None or (
            value > self.best + self.min_delta if self.mode == "max" else value < self.best - self.min_delta
        )
        if improved:
            self.best = value
            self.count = 0
        else:
            self.count += 1
            if self.count >= self.patience:
                if self.verbose:
                    logger.info(f"EarlyStop: `{self.monitor}` did not improve for {self.patience} epochs")
                context.stop_training = True


@register_callback("TimerCallback")
class TimerCallback(Callback):
    """Log epoch wall times (ref callbacks.py:784)."""

    def on_train_loader_start(self, context: PhaseContext):
        self._t0 = time.time()

    def on_train_loader_end(self, context: PhaseContext):
        context.metrics_dict["epoch_time_s"] = time.time() - self._t0


@register_callback("ProfilerCallback")
class ProfilerCallback(Callback):
    """Capture a ``jax.profiler`` trace for a step window (SURVEY §5 tracing
    analogue of the reference's TimerCallback + torch profiler usage).

    Starts the trace at ``start_step`` of ``profile_epoch`` and stops after
    ``num_steps`` train batches; the trace dir is viewable in TensorBoard's
    profile plugin / Perfetto.
    """

    def __init__(self, logdir: str = "profile", profile_epoch: int = 1,
                 start_step: int = 5, num_steps: int = 5):
        self.logdir = logdir
        self.profile_epoch = profile_epoch
        self.start_step = start_step
        self.num_steps = num_steps
        self._batch = 0
        self._active = False

    def on_train_loader_start(self, context: PhaseContext):
        self._batch = 0

    def on_train_batch_end(self, context: PhaseContext):
        if context.epoch != self.profile_epoch:
            return
        self._batch += 1
        if self._batch == self.start_step and not self._active:
            jax.profiler.start_trace(self.logdir)
            self._active = True
            logger.info(f"ProfilerCallback: tracing {self.num_steps} steps -> {self.logdir}")
        elif self._active and self._batch >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False

    def on_train_loader_end(self, context: PhaseContext):
        if self._active:  # loader shorter than the window
            jax.profiler.stop_trace()
            self._active = False


@register_callback("LRCallbackBase")
class LRLoggingCallback(Callback):
    def on_train_batch_end(self, context: PhaseContext):
        if context.lr is not None:
            context.metrics_dict["lr"] = context.lr


# ---------------------------------------------------------------- stage switch


def _close_multisample_transforms(loader) -> int:
    """Set prob=0 on mosaic/mixup transforms of a loader's dataset (the reference
    'no-aug last epochs' switch, callbacks.py:722). Returns #transforms closed."""
    ds = getattr(loader, "dataset", None)
    compose = getattr(ds, "transforms", None)
    tlist = getattr(compose, "transforms", None)
    if not tlist:
        return 0
    n = 0
    for t in tlist:
        if type(t).__name__ in ("DetectionMosaic", "DetectionMixup", "KeypointsMosaic", "KeypointsMixup") and hasattr(t, "prob"):
            t.prob = 0.0
            n += 1
    return n


@register_callback("YoloXTrainingStageSwitchCallback")
class YoloXTrainingStageSwitchCallback(Callback):
    """At ``next_stage_start_epoch``: close mosaic/mixup and enable the extra L1
    regression loss term (ref callbacks.py:722 YoloXTrainingStageSwitchCallback)."""

    def __init__(self, next_stage_start_epoch: int = 285):
        self.next_stage_start_epoch = next_stage_start_epoch
        self._done = False

    def on_train_loader_start(self, context: PhaseContext):
        if not self._done and context.epoch >= self.next_stage_start_epoch:
            n = _close_multisample_transforms(context.train_loader)
            context.update_criterion_params(use_l1=True)
            logger.info(f"YoloX stage switch at epoch {context.epoch}: closed {n} multi-sample transforms, use_l1=True")
            self._done = True


@register_callback("PPYoloETrainingStageSwitchCallback")
class PPYoloETrainingStageSwitchCallback(Callback):
    """Switch PPYoloELoss from the static ATSS assigner to TAL at
    ``static_assigner_end_epoch`` (ref ppyoloe_switch_callback.py:7)."""

    def __init__(self, static_assigner_end_epoch: int = 150):
        self.static_assigner_end_epoch = static_assigner_end_epoch
        self._done = False

    def on_train_loader_start(self, context: PhaseContext):
        if not self._done and context.epoch >= self.static_assigner_end_epoch:
            context.update_criterion_params(use_static_assigner=False)
            logger.info(f"PPYoloE stage switch at epoch {context.epoch}: static assigner -> TAL")
            self._done = True


# ---------------------------------------------------------------- visualization


def _live_variables(context: PhaseContext):
    """The weights to visualize with: the live (EMA) training weights when
    available, else the model wrapper's own (ref: context.net is the live net)."""
    v = getattr(context, "eval_variables", None)
    return v if v is not None else context.model.variables


class _DetectionProgramCache:
    """Per-callback jitted forward+NMS taking variables as an ARG, so live
    training weights can be fed without re-compiling each epoch."""

    def __init__(self):
        self._prog = None

    def __call__(self, model, variables, images_np, conf: float):
        import jax
        import jax.numpy as jnp

        from super_gradients_tpu.ops.nms import batched_nms

        if self._prog is None:
            module = model.module

            @jax.jit
            def prog(v, x):
                out = module.apply(v, x, train=False)
                return batched_nms(
                    out.pred_bboxes.astype(jnp.float32), out.pred_scores.astype(jnp.float32),
                    score_threshold=conf, iou_threshold=0.7, nms_top_k=256, max_predictions=100, mode="fast",
                )

            self._prog = prog
        return self._prog(variables, jnp.asarray(images_np))


@register_callback("DetectionVisualizationCallback")
class DetectionVisualizationCallback(Callback):
    """Draw predictions on a validation batch and send them to the sg_logger
    (ref callbacks.py:625 DetectionVisualizationCallback)."""

    def __init__(self, freq: int = 1, batch_idx: int = 0, max_images: int = 4, conf: float = 0.25):
        self.freq = freq
        self.batch_idx = batch_idx
        self.max_images = max_images
        self.conf = conf
        self._cache = _DetectionProgramCache()

    def on_validation_batch_end(self, context: PhaseContext):
        if context.epoch % self.freq != 0 or context.batch_idx != self.batch_idx or context.valid_batch is None:
            return
        import numpy as np

        from super_gradients_tpu.inference.prediction_results import DetectionPrediction

        model = context.model
        if getattr(model, "task", None) != "detection":
            return
        images = np.asarray(context.valid_batch[0])[: self.max_images]
        out = self._cache(model, _live_variables(context), images, self.conf)
        nums = np.asarray(out.num_detections)
        for j in range(images.shape[0]):
            n = int(nums[j])
            img = images[j]
            img_u8 = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255).astype(np.uint8)
            pred = DetectionPrediction(
                bboxes_xyxy=np.asarray(out.boxes[j, :n]),
                confidence=np.asarray(out.scores[j, :n]),
                labels=np.asarray(out.labels[j, :n]),
                class_names=getattr(model, "_class_names", None),
                image=img_u8,
            )
            if context.sg_logger is not None:
                context.sg_logger.add_image(f"valid_detections/img{j}", pred.draw(), context.epoch)


@register_callback("SegmentationVisualizationCallback")
class SegmentationVisualizationCallback(Callback):
    """Overlay predicted masks on a validation batch (ref callbacks.py:664)."""

    def __init__(self, freq: int = 1, batch_idx: int = 0, max_images: int = 4, alpha: float = 0.5):
        self.freq = freq
        self.batch_idx = batch_idx
        self.max_images = max_images
        self.alpha = alpha

    def on_validation_batch_end(self, context: PhaseContext):
        if context.epoch % self.freq != 0 or context.batch_idx != self.batch_idx or context.valid_batch is None:
            return
        import jax.numpy as jnp
        import numpy as np

        from super_gradients_tpu.inference.prediction_results import SegmentationPrediction

        model = context.model
        images = np.asarray(context.valid_batch[0])[: self.max_images]
        out = model.module.apply(_live_variables(context), jnp.asarray(images), train=False)
        logits = out[0] if isinstance(out, (tuple, list)) else out
        masks = np.asarray(jnp.argmax(logits, axis=-1))
        for j in range(images.shape[0]):
            img = images[j]
            img_u8 = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255).astype(np.uint8)
            pred = SegmentationPrediction(segmentation_map=masks[j], image=img_u8)
            if context.sg_logger is not None:
                context.sg_logger.add_image(f"valid_segmentation/img{j}", pred.draw(alpha=self.alpha), context.epoch)


class ExtremeBatchCaseVisualizationCallback(Callback):
    """Track the train batch with extreme (max/min) loss over an epoch and
    visualize it at epoch end (ref callbacks.py:1024 ExtremeBatchCaseVisualizationCallback).

    Reads the per-step loss from the device each batch — this host sync is the
    price of the feature (opt-in, same as the reference computing extra metrics).
    """

    def __init__(self, max_: bool = True, freq: int = 1, max_images: int = 4):
        self.max_ = max_
        self.freq = freq
        self.max_images = max_images
        self._extreme_loss = None
        self._extreme_batch = None

    def on_train_loader_start(self, context: PhaseContext):
        self._extreme_loss, self._extreme_batch = None, None

    def on_train_batch_end(self, context: PhaseContext):
        if context.epoch % self.freq != 0 or context.step_metrics is None or context.train_batch is None:
            return
        loss = float(context.step_metrics["loss"])
        better = (
            self._extreme_loss is None
            or (loss > self._extreme_loss if self.max_ else loss < self._extreme_loss)
        )
        if better:
            self._extreme_loss = loss
            self._extreme_batch = context.train_batch

    def on_train_loader_end(self, context: PhaseContext):
        if self._extreme_batch is None or context.epoch % self.freq != 0:
            return
        self._visualize(context, self._extreme_batch, self._extreme_loss)

    def _visualize(self, context, batch, loss):  # override per task
        pass

    def _tag(self):
        return f"extreme_batch_{'max' if self.max_ else 'min'}_loss"


@register_callback("ExtremeBatchDetectionVisualizationCallback")
class ExtremeBatchDetectionVisualizationCallback(ExtremeBatchCaseVisualizationCallback):
    """ref callbacks.py:1260 ExtremeBatchDetectionVisualizationCallback."""

    def _visualize(self, context, batch, loss):
        import numpy as np

        from super_gradients_tpu.inference.prediction_results import DetectionPrediction

        model = context.model
        if getattr(model, "task", None) != "detection":
            return
        if not hasattr(self, "_cache"):
            self._cache = _DetectionProgramCache()
        images = np.asarray(batch[0])[: self.max_images]
        out = self._cache(model, _live_variables(context), images, 0.25)
        nums = np.asarray(out.num_detections)
        for j in range(images.shape[0]):
            n = int(nums[j])
            img = images[j]
            img_u8 = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255).astype(np.uint8)
            pred = DetectionPrediction(
                bboxes_xyxy=np.asarray(out.boxes[j, :n]),
                confidence=np.asarray(out.scores[j, :n]),
                labels=np.asarray(out.labels[j, :n]),
                class_names=getattr(model, "_class_names", None),
                image=img_u8,
            )
            if context.sg_logger is not None:
                context.sg_logger.add_image(f"{self._tag()}/img{j} (loss={loss:.3f})", pred.draw(), context.epoch)


@register_callback("ExtremeBatchSegVisualizationCallback")
class ExtremeBatchSegVisualizationCallback(ExtremeBatchCaseVisualizationCallback):
    """ref callbacks.py:1429 ExtremeBatchSegVisualizationCallback."""

    def _visualize(self, context, batch, loss):
        import jax.numpy as jnp
        import numpy as np

        from super_gradients_tpu.inference.prediction_results import SegmentationPrediction

        model = context.model
        images = np.asarray(batch[0])[: self.max_images]
        out = model.module.apply(_live_variables(context), jnp.asarray(images), train=False)
        logits = out[0] if isinstance(out, (tuple, list)) else out
        masks = np.asarray(jnp.argmax(logits, axis=-1))
        for j in range(images.shape[0]):
            img = images[j]
            img_u8 = np.clip(img * 255.0 if img.max() <= 1.5 else img, 0, 255).astype(np.uint8)
            pred = SegmentationPrediction(segmentation_map=masks[j], image=img_u8)
            if context.sg_logger is not None:
                context.sg_logger.add_image(f"{self._tag()}/img{j} (loss={loss:.3f})", pred.draw(), context.epoch)


# ------------------------------------------------------------ conversion check


@register_callback("ModelConversionCheckCallback")
class ModelConversionCheckCallback(Callback):
    """Export the model at training start and validate the artifact loads +
    runs — fail fast instead of after N epochs (ref callbacks.py:41
    ModelConversionCheckCallback; export here = jax.export StableHLO)."""

    def __init__(self, image_size: int = 320, batch_size: int = 1, out_path: str = None):
        self.image_size = image_size
        self.batch_size = batch_size
        self.out_path = out_path

    def on_training_start(self, context: PhaseContext):
        import os
        import tempfile

        model = context.model
        if getattr(model, "task", None) != "detection":
            logger.warning("ModelConversionCheckCallback: only detection export is checked — skipping")
            return
        from super_gradients_tpu.conversion.export import export_detection_model, load_exported

        path = self.out_path or os.path.join(tempfile.gettempdir(), f"{context.experiment_name}_conversion_check.stablehlo")
        export_detection_model(model, path, image_hw=(self.image_size, self.image_size), batch_size=self.batch_size)
        load_exported(path)
        logger.info(f"ModelConversionCheckCallback: export round-trip OK ({path})")


# ----------------------------------------------------- sliding-window validation


@register_callback("SlidingWindowValidationCallback")
class SlidingWindowValidationCallback(Callback):
    """Run sliding-window tiled inference over the validation set at the end of
    validation and log detection counts (ref callbacks.py:883 sliding-window
    validation switcher; here an additional pass, the primary metrics stay)."""

    def __init__(self, tile_size: int = 320, tile_step: int = 256, max_batches: int = 1):
        self.tile_size = tile_size
        self.tile_step = tile_step
        self.max_batches = max_batches

    def on_validation_loader_end(self, context: PhaseContext):
        import numpy as np

        from super_gradients_tpu.inference.sliding_window import SlidingWindowInferenceDetectionWrapper

        model = context.model
        if getattr(model, "task", None) != "detection" or context.valid_loader is None:
            return
        wrapper = SlidingWindowInferenceDetectionWrapper(model, tile_size=self.tile_size, tile_step=self.tile_step)
        total = 0
        for bi, batch in enumerate(context.valid_loader):
            if bi >= self.max_batches:
                break
            for img in np.asarray(batch[0]):
                out = wrapper(img)
                total += int(np.asarray(out.num_detections))
        context.metrics_dict["sliding_window_detections"] = total
        if context.sg_logger is not None:
            context.sg_logger.add_scalar("Valid/sliding_window_detections", total, context.epoch)
