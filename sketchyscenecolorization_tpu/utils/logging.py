"""Observability: parameter counting, loss EMA, throughput/ETA meters, a
JSONL metric writer, and a jax.profiler trace context.

Replaces the reference's TF summaries + hand-rolled printing
(``matching_main.py:90-109,216-228``, ``obj_lib/main_procedure.py:28-59,183-197``,
``bg_colorization_main.py:810-811,952-961``).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


def count_params(tree: Any, name: str = "params", verbose: bool = False) -> int:
    """Total (and optionally per-leaf) parameter counts
    (reference param printing, ``main_procedure.py:28-59``)."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    total = 0
    for path, leaf in leaves:
        n = int(np.prod(np.shape(leaf)))
        total += n
        if verbose:
            keys = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                            for p in path)
            print(f"{name}/{keys} | shape: {np.shape(leaf)} | num_param: {n}")
    print(f"Total {name} variables {total}.")
    return total


class LossEMA:
    """decay-0.99 scalar EMA, first value used as the init
    (``matching_main.py:90-91,221-222``)."""

    def __init__(self, decay: float = 0.99):
        self.decay = decay
        self.value: Optional[float] = None

    def update(self, x) -> float:
        x = float(x)
        self.value = x if self.value is None else \
            self.decay * self.value + (1 - self.decay) * x
        return self.value


class ThroughputMeter:
    """Per-step timing + ETA (``matching_main.py:216-228``)."""

    def __init__(self, total_steps: int):
        self.total_steps = total_steps
        self._accum = 0.0
        self._count = 0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.time()

    def stop(self, step: int) -> Dict[str, float]:
        dt = time.time() - self._t0
        self._accum += dt
        self._count += 1
        avg = self._accum / self._count
        return {"sec_per_step": avg,
                "steps_per_sec": 1.0 / avg if avg > 0 else 0.0,
                "eta_hours": (self.total_steps - step) * avg / 3600.0}

    def window_reset(self):
        self._accum = 0.0
        self._count = 0


class JsonlMetricWriter:
    """Append-only metrics log, one JSON object per write."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")

    def write(self, step: int, metrics: Dict[str, Any]) -> None:
        row = {"step": int(step)}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace (TensorBoard-viewable) when a dir is given."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
