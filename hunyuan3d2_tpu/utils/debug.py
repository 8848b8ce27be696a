"""Golden-stat instrumentation.

Behavioral parity: the reference's `todos.debug.output_var` tensor-stat
logging (SURVEY.md §4.2 — size/min/max/mean of every intermediate printed
and frozen into comments as cross-implementation golden values). Gated by
HY3DGEN_DEBUG=1 like the reference's timers.
"""

from __future__ import annotations

import os

import numpy as np


def tensor_stats(x) -> dict:
    arr = np.asarray(x, dtype=np.float32) if hasattr(x, "dtype") else np.asarray(x)
    return {
        "size": list(arr.shape),
        "dtype": str(getattr(x, "dtype", arr.dtype)),
        "min": float(arr.min()) if arr.size else None,
        "max": float(arr.max()) if arr.size else None,
        "mean": float(arr.mean()) if arr.size else None,
    }


def output_var(name: str, x, force: bool = False):
    """Print `tensor [name] size: [...] min/max/mean` (reference format)."""
    if not force and os.environ.get("HY3DGEN_DEBUG", "0") != "1":
        return None
    s = tensor_stats(x)
    print(f"tensor [{name}] size: {s['size']}, min: {s['min']:.6g}, "
          f"max: {s['max']:.6g}, mean: {s['mean']:.6g}")
    return s
