"""Environment variables & checkpoint directory layout.

Reference parity: ``common/environment/env_variables.py:6-54`` and
``common/environment/checkpoints_dir_utils.py:21-127`` (layout
``ckpt_root_dir/<experiment_name>/RUN_<YYYYMMDD_HHMMSS>/``).
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class EnvironmentVariables:
    """Typed accessors for the env vars the framework honors."""

    @property
    def console_log_level(self) -> str:
        return os.getenv("CONSOLE_LOG_LEVEL", "INFO")

    @property
    def pkg_checkpoints_dir(self) -> str:
        return os.getenv("PKG_CHECKPOINTS_DIR", os.path.expanduser("~/.cache/super_gradients_tpu/checkpoints"))

    @property
    def sg_tpu_home(self) -> str:
        return os.getenv("SG_TPU_HOME", os.path.expanduser("~/sg_tpu_checkpoints"))


env_variables = EnvironmentVariables()

_RUN_DIR_RE = re.compile(r"^RUN_(\d{8}_\d{6})$")


def generate_run_id() -> str:
    """``RUN_<YYYYMMDD_HHMMSS>`` run-dir name (reference ``checkpoints_dir_utils.py:21``)."""
    return "RUN_" + time.strftime("%Y%m%d_%H%M%S")


def get_checkpoints_dir_path(experiment_name: str, ckpt_root_dir: Optional[str] = None, run_id: Optional[str] = None) -> str:
    root = ckpt_root_dir or env_variables.sg_tpu_home
    path = os.path.join(root, experiment_name)
    if run_id:
        path = os.path.join(path, run_id)
    return path


def get_latest_run_id(experiment_name: str, ckpt_root_dir: Optional[str] = None) -> Optional[str]:
    exp_dir = get_checkpoints_dir_path(experiment_name, ckpt_root_dir)
    if not os.path.isdir(exp_dir):
        return None
    runs = sorted(d for d in os.listdir(exp_dir) if _RUN_DIR_RE.match(d))
    return runs[-1] if runs else None


def list_run_ids(experiment_name: str, ckpt_root_dir: Optional[str] = None) -> List[str]:
    exp_dir = get_checkpoints_dir_path(experiment_name, ckpt_root_dir)
    if not os.path.isdir(exp_dir):
        return []
    return sorted(d for d in os.listdir(exp_dir) if _RUN_DIR_RE.match(d))
