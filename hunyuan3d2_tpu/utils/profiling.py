"""Profiling / tracing helpers.

Parity: reference synchronize_timer (SURVEY.md §5 — CUDA-event scoped timer,
HY3DGEN_DEBUG-gated) is covered by utils/timer.py; this module adds the
TPU-native equivalents:
  * ``trace(dir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard/perfetto trace of device execution,
  * ``annotate(name)`` — named TraceAnnotation visible in the trace,
  * ``device_memory_stats()`` — HBM usage snapshot (parity for the
    reference's VRAM reporting, README.md:125).
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/hy3d_trace"):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    import jax

    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }
