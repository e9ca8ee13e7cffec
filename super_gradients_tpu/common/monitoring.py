"""System monitor: background thread sampling host + TPU stats into the logger.

Reference parity: ``common/environment/monitoring/monitoring.py:11`` (SystemMonitor
daemon thread → tensorboard scalars: CPU %, RAM, disk, network). TPU memory stats
come from ``jax.local_devices()[0].memory_stats()`` where the backend exposes them.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)


class SystemMonitor:
    def __init__(self, sg_logger, interval_s: float = 10.0):
        self.sg_logger = sg_logger
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._step = 0

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True, name="sg-system-monitor")
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    def sample(self) -> dict:
        import psutil

        stats = {
            "System/cpu_percent": psutil.cpu_percent(),
            "System/ram_percent": psutil.virtual_memory().percent,
            "System/disk_percent": psutil.disk_usage("/").percent,
        }
        try:
            import jax

            mem = jax.local_devices()[0].memory_stats() or {}
            if "bytes_in_use" in mem:
                stats["System/device_hbm_gb"] = mem["bytes_in_use"] / 1e9
            if "peak_bytes_in_use" in mem:
                stats["System/device_hbm_peak_gb"] = mem["peak_bytes_in_use"] / 1e9
        except Exception:
            pass
        return stats

    def _run(self):
        while not self._stop.wait(self.interval_s):
            try:
                for tag, value in self.sample().items():
                    self.sg_logger.add_scalar(tag, value, self._step)
                self._step += 1
            except Exception as e:
                logger.debug(f"system monitor sample failed: {e}")
