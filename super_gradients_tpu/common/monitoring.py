"""System monitor: background thread sampling host + TPU stats into the logger.

Reference parity: ``common/environment/monitoring/monitoring.py:11`` — SystemMonitor
daemon thread writing tensorboard scalars with AGGREGATED sampling: stats are sampled
at a fast sub-interval and written as aggregates (mean for gauges, delta-per-second
for IO/network counters) every ``aggregate_frequency`` seconds. Device (HBM) stats
come from ``jax.local_devices()[i].memory_stats()`` — the TPU analogue of the
reference's NVML GPU aggregators (monitoring.py:49-62).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Dict, List, Optional

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)


class StatAggregator:
    """Sample ``sampling_fn`` repeatedly; ``aggregate()`` collapses the window
    (ref monitoring/data_models.py StatAggregator)."""

    def __init__(self, name: str, sampling_fn: Callable[[], float], aggregate_fn: str = "average"):
        self.name = name
        self.sampling_fn = sampling_fn
        self.aggregate_fn = aggregate_fn  # "average" | "delta_per_s"
        self._samples: List[float] = []
        self._t0 = time.time()

    def sample(self):
        try:
            self._samples.append(float(self.sampling_fn()))
        except Exception:
            pass

    def aggregate(self) -> Optional[float]:
        if not self._samples:
            return None
        if self.aggregate_fn == "average":
            out = sum(self._samples) / len(self._samples)
        else:  # delta_per_s over the window (counters)
            dt = max(time.time() - self._t0, 1e-6)
            out = (self._samples[-1] - self._samples[0]) / dt
        self._samples = []
        self._t0 = time.time()
        return out


def _psutil_aggregators() -> List[StatAggregator]:
    import psutil

    aggs = [
        StatAggregator("System/cpu.usage_percent", psutil.cpu_percent),
        StatAggregator("System/memory.usage_percent", lambda: psutil.virtual_memory().percent),
        StatAggregator("System/disk.usage_percent", lambda: psutil.disk_usage("/").percent),
    ]
    if psutil.disk_io_counters() is not None:
        aggs += [
            StatAggregator("System/disk.io_write_mbs", lambda: psutil.disk_io_counters().write_bytes / 1e6, "delta_per_s"),
            StatAggregator("System/disk.io_read_mbs", lambda: psutil.disk_io_counters().read_bytes / 1e6, "delta_per_s"),
        ]
    try:
        psutil.net_io_counters()
        aggs += [
            StatAggregator("System/network.network_sent_mbs", lambda: psutil.net_io_counters().bytes_sent / 1e6, "delta_per_s"),
            StatAggregator("System/network.network_recv_mbs", lambda: psutil.net_io_counters().bytes_recv / 1e6, "delta_per_s"),
        ]
    except Exception:
        pass
    return aggs


def _device_aggregators() -> List[StatAggregator]:
    """Per-device HBM gauges (TPU analogue of the reference's per-GPU NVML stats)."""
    try:
        import jax

        devices = jax.local_devices()
    except Exception:
        return []
    aggs = []
    for i, d in enumerate(devices):
        try:
            if not d.memory_stats():
                continue
        except Exception:
            continue

        def _in_use(dev=d):
            return (dev.memory_stats() or {}).get("bytes_in_use", 0) / 1e9

        def _peak(dev=d):
            return (dev.memory_stats() or {}).get("peak_bytes_in_use", 0) / 1e9

        aggs.append(StatAggregator(f"System/device_{i}.hbm_in_use_gb", _in_use))
        aggs.append(StatAggregator(f"System/device_{i}.hbm_peak_gb", _peak))
    return aggs


class SystemMonitor:
    """ref monitoring.py:11-100: daemon thread, sample at ``sample_interval``,
    write aggregates every ``aggregate_frequency`` seconds."""

    _instance: Optional["SystemMonitor"] = None

    def __init__(self, sg_logger, aggregate_frequency: float = 30.0, n_samples_per_aggregate: int = 60):
        self.sg_logger = sg_logger
        self.aggregate_frequency = aggregate_frequency
        self.sample_interval = aggregate_frequency / n_samples_per_aggregate
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._step = 0
        self.stat_aggregators: List[StatAggregator] = _psutil_aggregators() + _device_aggregators()

    @classmethod
    def start_if_doesnt_exist(cls, sg_logger) -> "SystemMonitor":
        """ref monitoring.py SystemMonitor.start_if_doesnt_exist (process-wide singleton)."""
        if cls._instance is None:
            cls._instance = cls(sg_logger)
            cls._instance.start()
        return cls._instance

    def start(self):
        self._thread = threading.Thread(target=self._run, daemon=True, name="sg-system-monitor")
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        if SystemMonitor._instance is self:
            SystemMonitor._instance = None

    def sample(self) -> Dict[str, float]:
        """One-shot sample+aggregate of every stat (also used by tests)."""
        for agg in self.stat_aggregators:
            agg.sample()
        return {a.name: v for a in self.stat_aggregators if (v := a.aggregate()) is not None}

    def _write(self):
        for agg in self.stat_aggregators:
            v = agg.aggregate()
            if v is not None:
                try:
                    self.sg_logger.add_scalar(agg.name, v, self._step)
                except Exception as e:
                    logger.debug(f"system monitor write failed: {e}")
        self._step += 1

    def _run(self):
        last_write = time.time()
        while not self._stop.wait(self.sample_interval):
            for agg in self.stat_aggregators:
                agg.sample()
            if time.time() - last_write >= self.aggregate_frequency:
                self._write()
                last_write = time.time()
