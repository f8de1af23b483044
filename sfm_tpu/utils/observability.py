"""Tracing / profiling / metrics (SURVEY.md section 5 row 1).

The reference's observability is wall-clock deltas + tqdm + log lines
(main.py:192-252, find_matches.py:343). Here:

  * ``stage(name)`` — context manager that both logs the wall-clock and emits
    a jax.profiler TraceAnnotation so device traces line up with pipeline
    stages,
  * ``Metrics`` — a tiny append-only metrics sink (counter/gauge style) that
    serializes to JSON next to the run artifacts,
  * ``trace_to(dir)`` — wraps jax.profiler.trace for xprof-compatible dumps.
"""
from __future__ import annotations

import contextlib
import json
import logging
import time
from pathlib import Path
from typing import Dict, List

import jax

logger = logging.getLogger(__name__)


class Metrics:
    """Append-only metrics sink; one JSON file per run."""

    def __init__(self):
        self.records: List[Dict] = []
        self._t0 = time.time()

    def log(self, name: str, value, **tags):
        self.records.append(
            {"t": round(time.time() - self._t0, 4), "name": name, "value": value, **tags}
        )

    def save(self, path):
        Path(path).write_text(json.dumps(self.records, indent=1))

    def totals(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            if isinstance(r["value"], (int, float)):
                out[r["name"]] = out.get(r["name"], 0.0) + r["value"]
        return out


GLOBAL_METRICS = Metrics()


@contextlib.contextmanager
def stage(name: str, metrics: Metrics = None, log_level=logging.INFO):
    """Time a pipeline stage; annotate device traces with the same name."""
    m = metrics or GLOBAL_METRICS
    t0 = time.time()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.time() - t0
    m.log(f"stage/{name}", dt, unit="s")
    logger.log(log_level, "%s: %.2fs", name, dt)


@contextlib.contextmanager
def trace_to(log_dir):
    """Capture an xprof-compatible device trace into ``log_dir``."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(log_dir)):
        yield
