"""Metric base: functional accumulator protocol."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence


class Metric:
    """Functional metric: state is a pytree; update is jittable.

    Host metrics (``host_update=True``, e.g. mAP matching) additionally get a
    jittable ``preprocess_device`` hook that runs INSIDE the eval step (NMS,
    decode, top-k) so only small fixed-shape tensors cross to the host — the
    analogue of the reference's ``accumulate_on_cpu`` strategy
    (``detection_metrics.py:28-468``).
    """

    #: name under which compute() results are reported
    name: str = "metric"
    #: if True, update() runs on host (numpy) instead of inside jit (heavy matching)
    host_update: bool = False
    greater_is_better: bool = True

    def init(self) -> Any:
        raise NotImplementedError

    def preprocess_device(self, outputs: Any, targets: Any) -> Any:
        """Jittable reduction of raw model outputs to what update() needs."""
        return outputs

    def update(self, state: Any, outputs: Any, targets: Any) -> Any:
        raise NotImplementedError

    def compute(self, state: Any) -> Dict[str, float]:
        raise NotImplementedError


class MetricCollection:
    """Named collection with a combined state tuple."""

    def __init__(self, metrics: Sequence[Metric]):
        self.metrics = list(metrics)

    def init(self):
        return tuple(m.init() for m in self.metrics)

    def update(self, states, outputs, targets):
        return tuple(m.update(s, outputs, targets) for m, s in zip(self.metrics, states))

    def update_device(self, states, outputs, targets):
        """Update only jittable metrics (called inside the eval step)."""
        return tuple(
            m.update(s, outputs, targets) if not m.host_update else s for m, s in zip(self.metrics, states)
        )

    def preprocess_device(self, outputs, targets):
        """Run host-metrics' jittable reductions (inside the eval step)."""
        return tuple(m.preprocess_device(outputs, targets) if m.host_update else None for m in self.metrics)

    def update_host(self, states, aux, targets):
        """aux: the per-metric preprocess_device results, fetched to host."""
        return tuple(
            m.update(s, a, targets) if m.host_update else s for m, s, a in zip(self.metrics, states, aux)
        )

    def has_host_metrics(self) -> bool:
        return any(m.host_update for m in self.metrics)

    # host-metric states (growing python lists) must never cross the jit boundary;
    # these helpers split/merge the device-only slice of the state tuple
    def device_states(self, states):
        return tuple(s for m, s in zip(self.metrics, states) if not m.host_update)

    def merge_device_states(self, states, dev_states):
        it = iter(dev_states)
        return tuple(next(it) if not m.host_update else s for m, s in zip(self.metrics, states))

    def update_device_only(self, dev_states, outputs, targets):
        dev_metrics = [m for m in self.metrics if not m.host_update]
        return tuple(m.update(s, outputs, targets) for m, s in zip(dev_metrics, dev_states))

    def compute(self, states) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for m, s in zip(self.metrics, states):
            out.update(m.compute(s))
        return out
