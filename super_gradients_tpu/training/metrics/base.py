"""Metric base: functional accumulator protocol."""

from __future__ import annotations

from typing import Any, Dict, List, Sequence


class Metric:
    """Functional metric: state is a pytree; update is jittable."""

    #: name under which compute() results are reported
    name: str = "metric"
    #: if True, update() runs on host (numpy) instead of inside jit (heavy matching)
    host_update: bool = False
    greater_is_better: bool = True

    def init(self) -> Any:
        raise NotImplementedError

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

    def update_host(self, states, outputs, targets):
        return tuple(
            m.update(s, outputs, targets) if m.host_update else s for m, s in zip(self.metrics, states)
        )

    def has_host_metrics(self) -> bool:
        return any(m.host_update for m in self.metrics)

    def compute(self, states) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for m, s in zip(self.metrics, states):
            out.update(m.compute(s))
        return out
