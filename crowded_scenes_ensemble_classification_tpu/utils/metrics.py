"""Observability: structured metric stream, stage timers, profiler hooks.

The reference's only observability was stdout prints and Keras progress bars
(SURVEY.md §5 'metrics/logging').  Here:

- `MetricsLogger` — append-only JSONL event stream (one object per line:
  step/epoch metrics, stage timings, artifacts written),
- `StageTimer` — wall-clock timing of pipeline stages
  (decode/augment/forward/fusion) with items/sec, feeding the clips/sec
  headline metric (BASELINE.json),
- `profile_trace` — jax.profiler trace context for TensorBoard-compatible
  device profiles.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    """Append-only JSONL metrics file.  Safe to re-open across runs."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        record = {"t": time.time(), "event": event, **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        return record

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]


class StageTimer:
    """Accumulates wall-clock per named stage; `rates(n)` converts to
    items/sec."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + items

    def seconds(self, name: str) -> float:
        return self.totals.get(name, 0.0)

    def rate(self, name: str) -> float:
        """items/sec for the stage (0 when untimed)."""
        t = self.totals.get(name, 0.0)
        return self.counts.get(name, 0) / t if t > 0 else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "seconds": self.totals[name],
                "items": self.counts.get(name, 0),
                "items_per_sec": self.rate(name),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
