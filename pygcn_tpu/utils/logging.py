"""Metrics logging and wall-clock tracing.

The reference's observability is bare ``print`` + ``time.time()`` deltas
scattered through every script (e.g. ``pygcn/gnn-over-mlp.py:400,429``,
``rl-policy-generator.py:597``). Here: a structured ``MetricsLogger`` (stdout +
optional JSONL file) and a ``timed`` context/decorator, plus an optional hook
into ``jax.profiler`` traces for real TPU profiling.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, jsonl_path: Optional[str] = None, echo: bool = True):
        self.jsonl_path = jsonl_path
        self.echo = echo
        self._fh = open(jsonl_path, "a") if jsonl_path else None

    def log(self, step: int, **metrics) -> None:
        rec = {"step": int(step), "time": time.time(), **{
            k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()
        }}
        if self.echo:
            parts = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}"
                             for k, v in rec.items() if k != "time")
            print(parts, flush=True)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


@contextlib.contextmanager
def timed(label: str, echo: bool = True):
    t0 = time.perf_counter()
    yield
    if echo:
        print(f"[timed] {label}: {time.perf_counter() - t0:.3f}s", flush=True)


@contextlib.contextmanager
def tpu_trace(log_dir: Optional[str]):
    """Wrap a region in a ``jax.profiler`` trace when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
