"""Scoped wall-clock timer usable as context manager or decorator.

Behavioral parity: hy3dgen/shapegen/utils.py:38-86 (`synchronize_timer`, a
CUDA-event timer gated by HY3DGEN_DEBUG=1). The TPU equivalent synchronizes by
blocking on outstanding device work (``jax.block_until_ready`` semantics are
the caller's job for traced values; we block the default device's async queue
via ``jax.effects_barrier`` when available).
"""

import functools
import os
import time

from hunyuan3d2_tpu.utils.logger import get_logger

logger = get_logger("hunyuan3d2_tpu.timer")

# Global registry of the most recent timings, keyed by tag. Apps surface this
# in response metadata (parity: gradio stats dict, gradio_app.py:170-237).
LAST_TIMINGS = {}


def _device_sync():
    try:
        import jax

        jax.effects_barrier()
    except Exception:  # pragma: no cover - jax always importable in this env
        pass


def _enabled() -> bool:
    return os.environ.get("HY3DGEN_DEBUG", "0") == "1"


class synchronize_timer:
    """``with synchronize_timer('stage'):`` or ``@synchronize_timer('stage')``.

    Records elapsed wall-clock (after draining the device queue) into
    ``LAST_TIMINGS[tag]`` and logs it when HY3DGEN_DEBUG=1.
    """

    def __init__(self, tag: str = ""):
        self.tag = tag
        self.elapsed = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        _device_sync()
        self.elapsed = time.perf_counter() - self._t0
        LAST_TIMINGS[self.tag] = self.elapsed
        if _enabled():
            logger.info("%s takes %.4f s", self.tag, self.elapsed)
        return False

    def __call__(self, fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with synchronize_timer(self.tag or fn.__qualname__):
                return fn(*args, **kwargs)

        return wrapper


class timed_scope(synchronize_timer):
    """Always-recording variant used by the pipelines to fill their
    per-stage stats dicts (LAST_TIMINGS); logs too under HY3DGEN_DEBUG=1."""

    def __exit__(self, *exc):
        _device_sync()
        self.elapsed = time.perf_counter() - self._t0
        LAST_TIMINGS[self.tag] = self.elapsed
        if _enabled():
            logger.info("%s takes %.4f s", self.tag, self.elapsed)
        return False
