"""Experiment loggers (SGLogger sinks).

Reference parity: ``common/sg_loggers/`` — AbstractSGLogger (abstract_sg_logger.py:11,
add_scalar/images/text/config/checkpoint surface), BaseSGLogger (console + TB + file,
base_sg_logger.py:38-379, every write process-0-gated), registry ``SG_LOGGERS``
selected by ``training_params.sg_logger``.

Sinks here: console, JSONL metrics file (machine-readable training log), and
TensorBoard event files via torch.utils.tensorboard when available. W&B/ClearML
require network credentials — registered as explicit not-available stubs in this
zero-egress environment.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np

from super_gradients_tpu.common.logging_utils import get_logger
from super_gradients_tpu.common.registry import register_sg_logger

logger = get_logger(__name__)


def _is_primary() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


class AbstractSGLogger:
    """ref abstract_sg_logger.py:11-178."""

    def add_config(self, tag: str, config: Dict):
        pass

    def add_scalar(self, tag: str, value: float, global_step: int = 0):
        pass

    def add_scalars(self, tag_scalar_dict: Dict[str, float], global_step: int = 0):
        for k, v in tag_scalar_dict.items():
            self.add_scalar(k, v, global_step)

    def add_image(self, tag: str, image: np.ndarray, global_step: int = 0):
        pass

    def add_text(self, tag: str, text: str, global_step: int = 0):
        pass

    def add_checkpoint(self, tag: str, state_dict: Any, global_step: int = 0):
        pass

    def upload(self):
        pass

    def flush(self):
        pass

    def close(self):
        pass


@register_sg_logger("base_sg_logger")
class BaseSGLogger(AbstractSGLogger):
    """Console + JSONL + TensorBoard (ref base_sg_logger.py:38)."""

    def __init__(
        self,
        experiment_name: str = "experiment",
        storage_location: Optional[str] = None,
        checkpoints_dir_path: Optional[str] = None,
        monitor_system: bool = False,
        tensorboard: bool = True,
        **kwargs,
    ):
        self.experiment_name = experiment_name
        self.dir = checkpoints_dir_path or storage_location or "."
        self._jsonl = None
        self._tb = None
        self._monitor = None
        if _is_primary():
            os.makedirs(self.dir, exist_ok=True)
            self._jsonl = open(os.path.join(self.dir, "events.jsonl"), "a")
            if tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(log_dir=os.path.join(self.dir, "tensorboard"))
                except Exception as e:  # TB optional
                    logger.debug(f"TensorBoard writer unavailable: {e}")
            if monitor_system:
                from super_gradients_tpu.common.monitoring import SystemMonitor

                self._monitor = SystemMonitor(self)
                self._monitor.start()

    def add_config(self, tag: str, config: Dict):
        if self._jsonl:
            self._jsonl.write(json.dumps({"type": "config", "tag": tag, "config": config, "ts": time.time()}, default=str) + "\n")
            self._jsonl.flush()
        if self._tb:
            self._tb.add_text(tag, f"```\n{json.dumps(config, indent=2, default=str)}\n```")

    def add_scalar(self, tag: str, value: float, global_step: int = 0):
        if self._jsonl:
            self._jsonl.write(json.dumps({"type": "scalar", "tag": tag, "value": float(value), "step": int(global_step)}) + "\n")
        if self._tb:
            self._tb.add_scalar(tag, float(value), int(global_step))

    def add_image(self, tag: str, image: np.ndarray, global_step: int = 0):
        if self._tb is not None:
            self._tb.add_image(tag, image, int(global_step), dataformats="HWC")
        # always also dump a PNG next to the checkpoints (ref BaseSGLogger writes
        # visualization artifacts to the experiment dir)
        try:
            from PIL import Image

            img_dir = os.path.join(self.dir, "images")
            os.makedirs(img_dir, exist_ok=True)
            safe = tag.replace("/", "_").replace(" ", "_")
            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = np.clip(arr, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, f"{safe}_step{int(global_step)}.png"))
        except Exception as e:
            logger.debug(f"add_image PNG dump failed: {e}")

    def add_text(self, tag: str, text: str, global_step: int = 0):
        if self._jsonl:
            self._jsonl.write(json.dumps({"type": "text", "tag": tag, "text": text, "step": int(global_step)}) + "\n")
        if self._tb:
            self._tb.add_text(tag, text, int(global_step))

    def flush(self):
        if self._jsonl:
            self._jsonl.flush()
        if self._tb:
            self._tb.flush()

    def close(self):
        if self._monitor:
            self._monitor.stop()
        self.flush()
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()


@register_sg_logger("wandb_sg_logger")
class WandBSGLogger(BaseSGLogger):
    """Weights & Biases sink (ref common/sg_loggers/wandb_sg_logger.py).

    Functional when the ``wandb`` package + credentials are present; falls back to
    the local JSONL/TB sinks otherwise (zero-egress environments keep working)."""

    def __init__(self, project_name: str = "super-gradients-tpu", entity: str = None,
                 wandb_id: str = None, **kwargs):
        super().__init__(**kwargs)
        self._wandb = None
        if not _is_primary():
            return
        try:
            import wandb

            self._wandb = wandb
            wandb.init(project=project_name, entity=entity, id=wandb_id, resume="allow",
                       name=kwargs.get("experiment_name"), dir=getattr(self, "_log_dir", None))
        except Exception as e:
            logger.warning(f"wandb unavailable ({type(e).__name__}: {e}); using local JSONL/TB sinks only")
            self._wandb = None

    def add_scalar(self, tag, value, global_step: int = 0):
        super().add_scalar(tag, value, global_step)
        if self._wandb is not None:
            try:
                self._wandb.log({tag: float(value)}, step=int(global_step))
            except Exception as e:
                logger.debug(f"wandb scalar log failed: {e}")

    def add_config(self, tag, config):
        super().add_config(tag, config)
        if self._wandb is not None and getattr(self._wandb, "run", None) is not None:
            try:
                self._wandb.run.config.update({tag: config}, allow_val_change=True)
            except Exception as e:
                logger.debug(f"wandb config update failed: {e}")

    def close(self):
        if self._wandb is not None and getattr(self._wandb, "run", None) is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
        super().close()


@register_sg_logger("clearml_sg_logger")
class ClearMLSGLogger(BaseSGLogger):
    """ClearML sink (ref common/sg_loggers/clearml_sg_logger.py). Functional when
    the ``clearml`` package + credentials exist; local sinks otherwise."""

    def __init__(self, project_name: str = "super-gradients-tpu", **kwargs):
        super().__init__(**kwargs)
        self._task = None
        if not _is_primary():
            return
        try:
            from clearml import Task

            self._task = Task.init(project_name=project_name,
                                   task_name=kwargs.get("experiment_name", "experiment"))
        except Exception as e:
            logger.warning(f"clearml unavailable ({type(e).__name__}: {e}); using local JSONL/TB sinks only")
            self._task = None

    def add_scalar(self, tag, value, global_step: int = 0):
        super().add_scalar(tag, value, global_step)
        if self._task is not None:
            try:
                series = tag.rsplit("/", 1)
                title, series_name = (series[0], series[1]) if len(series) == 2 else (tag, tag)
                self._task.get_logger().report_scalar(title, series_name, float(value), int(global_step))
            except Exception as e:
                logger.debug(f"clearml scalar log failed: {e}")

    def close(self):
        if self._task is not None:
            try:
                self._task.close()
            except Exception:
                pass
        super().close()


@register_sg_logger("dagshub_sg_logger")
class DagsHubSGLogger(BaseSGLogger):
    """DagsHub sink (ref common/sg_loggers/dagshub_sg_logger.py:34). The reference
    logs through MLflow against a ``dagshub.com/<owner>/<repo>.mlflow`` tracking
    remote; this sink does the same when ``mlflow`` (+ optionally ``dagshub``) is
    importable and falls back to the local JSONL/TB sinks otherwise."""

    def __init__(self, dagshub_repository: str = None, log_mlflow_only: bool = False, **kwargs):
        super().__init__(**kwargs)
        self._mlflow = None
        self.log_mlflow_only = log_mlflow_only
        if not _is_primary():
            return
        try:
            import mlflow

            if dagshub_repository:
                owner, repo = self._split_repo(dagshub_repository)
                try:  # dagshub.init wires credentials when available
                    import dagshub

                    dagshub.init(repo_name=repo, repo_owner=owner)
                except Exception:
                    pass
                # the reference sets the tracking remote explicitly even after
                # dagshub.init (ref dagshub_sg_logger.py:155); do the same so a
                # no-op init never leaves mlflow pointed at the default store
                mlflow.set_tracking_uri(f"https://dagshub.com/{owner}/{repo}.mlflow")
            mlflow.start_run(run_name=kwargs.get("experiment_name"))
            self._mlflow = mlflow
        except Exception as e:
            logger.warning(f"dagshub/mlflow unavailable ({type(e).__name__}: {e}); using local JSONL/TB sinks only")
            self._mlflow = None

    @staticmethod
    def _split_repo(repo: str):
        parts = repo.split("/")
        if len(parts) != 2:
            raise ValueError(f"Invalid input, should be owner_name/repo_name, but got {repo} instead")
        return parts[0], parts[1]

    def add_scalar(self, tag, value, global_step: int = 0):
        super().add_scalar(tag, value, global_step)
        if self._mlflow is not None:
            try:
                # mlflow metric keys forbid '/'; the reference sanitizes the same way
                self._mlflow.log_metric(tag.replace("/", "_"), float(value), step=int(global_step))
            except Exception as e:
                logger.debug(f"mlflow scalar log failed: {e}")

    def add_config(self, tag, config):
        super().add_config(tag, config)
        if self._mlflow is not None:
            try:
                flat = config if not isinstance(config, dict) else {f"{tag}.{k}": v for k, v in config.items()}
                self._mlflow.log_params({k: str(v)[:250] for k, v in (flat if isinstance(flat, dict) else {tag: flat}).items()})
            except Exception as e:
                logger.debug(f"mlflow config log failed: {e}")

    def close(self):
        if self._mlflow is not None:
            try:
                self._mlflow.end_run()
            except Exception:
                pass
        super().close()


@register_sg_logger("deci_platform_sg_logger")
class DeciPlatformSGLogger(BaseSGLogger):
    """Deci platform sink (ref common/sg_loggers/deci_platform_sg_logger.py).
    The platform service no longer exists; when the ``deci_platform_client``
    package is absent (always, in zero-egress environments) this degrades to the
    local JSONL/TB sinks so recipes referencing it keep training."""

    def __init__(self, model_name: str = None, upload_model: bool = True, **kwargs):
        super().__init__(**kwargs)
        self._client = None
        self.model_name = model_name
        self.upload_model = upload_model
        if not _is_primary():
            return
        try:
            from deci_platform_client import DeciPlatformClient  # noqa: F401 — never present offline

            self._client = DeciPlatformClient()
            self._client.register_experiment(name=kwargs.get("experiment_name", "experiment"))
        except Exception as e:
            logger.warning(f"deci platform unavailable ({type(e).__name__}: {e}); using local JSONL/TB sinks only")
            self._client = None

    def close(self):
        if self._client is not None:
            try:
                self._client.save_experiment_file(file_path=getattr(self, "_jsonl_path", ""))
            except Exception:
                pass
        super().close()


def get_sg_logger(name: str, **params) -> AbstractSGLogger:
    from super_gradients_tpu.common.registry import SG_LOGGERS

    if isinstance(name, AbstractSGLogger):
        return name
    if name not in SG_LOGGERS:
        raise KeyError(f"Unknown sg_logger `{name}`; registered: {sorted(SG_LOGGERS)}")
    return SG_LOGGERS[name](**params)
