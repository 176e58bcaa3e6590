"""Metric logging: JSONL + stdout, wandb-compatible interface when available.

Replaces the reference's scattered wandb/plain-logfile logging
(SURVEY.md §5.5) with one MetricLogger used by all domain trainers. Also
provides step timing / throughput tracking (the reference only has ad-hoc
wall-clock timers, SURVEY.md §5.1) and an optional jax.profiler trace hook.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, use_wandb: bool = False,
                 wandb_kwargs: Optional[dict] = None, stdout: bool = True):
        self.stdout = stdout
        self.jsonl = None
        self._wandb = None
        self._t_last = None
        self._step_last = None
        if log_dir and jax.process_index() == 0:
            os.makedirs(log_dir, exist_ok=True)
            self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if use_wandb and jax.process_index() == 0:
            try:
                import wandb

                wandb.init(**(wandb_kwargs or {}))
                self._wandb = wandb
            except ImportError:
                print("wandb not installed; falling back to JSONL logging")

    def log(self, metrics: Dict, step: int, samples_per_step: Optional[int] = None):
        if jax.process_index() != 0:
            return
        now = time.perf_counter()
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._t_last is not None and step > self._step_last:
            dt = now - self._t_last
            steps = step - self._step_last
            metrics["steps_per_sec"] = steps / dt
            if samples_per_step:
                metrics["samples_per_sec"] = steps * samples_per_step / dt
        self._t_last, self._step_last = now, step
        record = {"step": step, **metrics}
        if self.stdout:
            short = {k: round(v, 5) for k, v in metrics.items()}
            print(f"[step {step}] {short}")
        if self.jsonl:
            self.jsonl.write(json.dumps(record) + "\n")
            self.jsonl.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def close(self):
        if self.jsonl:
            self.jsonl.close()
        if self._wandb:
            self._wandb.finish()


def profile_trace(log_dir: str, num_steps: int = 5):
    """Context manager capturing a jax.profiler trace of a few steps."""
    return jax.profiler.trace(log_dir)
