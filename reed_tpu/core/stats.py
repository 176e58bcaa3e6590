"""Distributed training-stats collection: accumulate scalar statistics
across steps and hosts, then report means/stds.

Clean-room rebuild of the edm2-derived training_stats the reference vendors
(image/preprocessing/torch_utils/training_stats.py:55-260 `report` /
`Collector` with a cross-rank `_sync` all-reduce): each report accumulates
[count, sum, sum-of-squares] moments; sync reduces across processes with a
psum over the 'data' axis (replacing torch.distributed.all_reduce).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

_counters: Dict[str, np.ndarray] = {}


def report(name: str, value) -> None:
    """Accumulate [num, sum, sum_sq] moments for `name`
    (reference: training_stats.py:55-113)."""
    arr = np.asarray(jax.device_get(value), np.float64).ravel()
    if arr.size == 0:
        return
    moments = np.array([arr.size, arr.sum(), np.square(arr).sum()],
                       np.float64)
    _counters[name] = _counters.get(name, np.zeros(3)) + moments


def report0(name: str, value) -> None:
    """Report only on process 0 (rank-gated logging)."""
    if jax.process_index() == 0:
        report(name, value)


class Collector:
    """Snapshot + query interface (reference: training_stats.py:115-235)."""

    def __init__(self):
        self._deltas: Dict[str, np.ndarray] = {}
        self._cumulative: Dict[str, np.ndarray] = {}

    def update(self, cross_process: bool = False):
        """Capture deltas since the last update; optionally all-reduce
        moments across processes (reference `_sync`, :236-260)."""
        for name, total in list(_counters.items()):
            prev = self._cumulative.get(name, np.zeros(3))
            delta = total - prev
            self._cumulative[name] = total.copy()
            if cross_process and jax.process_count() > 1:
                from jax.experimental import multihost_utils

                delta = np.asarray(multihost_utils.process_allgather(
                    jnp.asarray(delta)).sum(axis=0))
            self._deltas[name] = delta

    def names(self):
        return list(self._deltas)

    def num(self, name: str) -> int:
        return int(self._deltas.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        d = self._deltas.get(name, np.zeros(3))
        return float(d[1] / d[0]) if d[0] > 0 else float("nan")

    def std(self, name: str) -> float:
        d = self._deltas.get(name, np.zeros(3))
        if d[0] <= 1:
            return 0.0
        mean = d[1] / d[0]
        var = max(d[2] / d[0] - mean ** 2, 0.0)
        return float(np.sqrt(var))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {name: {"num": self.num(name), "mean": self.mean(name),
                       "std": self.std(name)} for name in self.names()}


def reset():
    _counters.clear()
