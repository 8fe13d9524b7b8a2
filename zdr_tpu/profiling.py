"""Timing / observability helpers.

The reference has no tracing or profiling at all (SURVEY.md §5: throughput
was eyeballed from tqdm). Here: a device-honest timer and a tiny structured
run logger for optimization loops.

Caveat this module exists to encode: on the axon remote-TPU platform,
`block_until_ready()` returns before the computation finishes (the tunnel
acks the handle, not the result), so naive timers under-report by orders of
magnitude. The only reliable fence is a host transfer; `device_time` times
`n` chained invocations and fences with a scalar readback.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def _fence(out) -> None:
    """Force real completion: pull one scalar to host."""
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])


def device_time(fn: Callable, *args, iters: int = 5, warmup: int = 1, **kwargs) -> float:
    """Average seconds per call of fn(*args), fenced by host transfer."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    if out is not None:
        _fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    _fence(out)
    return (time.perf_counter() - t0) / iters


class RunLogger:
    """Structured per-iteration logging (jsonl) for optimization loops —
    the reference logs with bare print (SURVEY.md §5)."""

    def __init__(self, path: Optional[str] = None, every: int = 1):
        self.path = path
        self.every = every
        self._fh = open(path, "a") if path else None
        self._t0 = time.perf_counter()

    def log(self, step: int, **metrics: Any) -> None:
        if step % self.every:
            return
        rec: Dict[str, Any] = {
            "step": step,
            "t": round(time.perf_counter() - self._t0, 3),
        }
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line, file=sys.stderr)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
