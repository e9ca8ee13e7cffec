"""Logger setup. Reference parity: ``common/abstractions/abstract_logger.py``.

Per-process logging with rank-aware muting: on a multi-host TPU pod every host runs the
same program; only process 0 logs at INFO by default (analogue of the reference's
``mute_current_process`` for DDP rank>0 workers).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_CONFIGURED = False
DEFAULT_LOGGING_LEVEL = os.environ.get("CONSOLE_LOG_LEVEL", "INFO").upper()


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def _configure_root():
    global _CONFIGURED
    if _CONFIGURED:
        return
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] - %(message)s"))
    root = logging.getLogger("super_gradients_tpu")
    root.addHandler(handler)
    level = DEFAULT_LOGGING_LEVEL if _process_index() == 0 else "ERROR"
    root.setLevel(level)
    root.propagate = False
    _CONFIGURED = True


def get_logger(name: str, log_level: Optional[str] = None) -> logging.Logger:
    _configure_root()
    logger = logging.getLogger(name if name.startswith("super_gradients_tpu") else f"super_gradients_tpu.{name}")
    if log_level:
        logger.setLevel(log_level)
    return logger


def mute_non_primary_process():
    if _process_index() != 0:
        logging.getLogger("super_gradients_tpu").setLevel("ERROR")
