"""Tracing / profiling utilities.

The reference has no tracing at all (SURVEY.md §5) — only manual time.time()
RTF measurement. Here:

  * `trace(logdir)`: context manager around jax.profiler for xplane/
    TensorBoard traces of any region
  * `timed`: host-side wall-clock timer that MATERIALIZES device outputs
    (this platform's block_until_ready can return early; np.asarray is the
    only trustworthy barrier — see bench.py)
  * `annotate`: named trace regions (shows up in the profiler timeline)
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace into `logdir` (xplane format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def materialize(tree: Any) -> Any:
    """Force a pytree of device arrays onto the host (true sync barrier)."""
    return jax.tree_util.tree_map(np.asarray, tree)


def timed(fn: Callable, *args, repeats: int = 5, warmup: int = 1,
          **kwargs) -> Tuple[float, Dict[str, float]]:
    """Median wall-clock seconds of fn(*args), outputs materialized."""
    for _ in range(warmup):
        materialize(fn(*args, **kwargs))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        materialize(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    arr = np.asarray(times)
    return float(np.median(arr)), {
        "median_s": float(np.median(arr)),
        "mean_s": float(arr.mean()),
        "min_s": float(arr.min()),
        "max_s": float(arr.max()),
        "repeats": repeats,
    }
