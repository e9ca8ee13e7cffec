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
        self.__dict__.update(kwargs)

    def update_context(self, **kwargs):
        self.__dict__.update(kwargs)


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
