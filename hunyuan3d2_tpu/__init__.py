"""hunyuan3d2_tpu — a TPU-native (JAX/XLA/Pallas) image→textured-3D-asset framework.

A from-scratch rebuild of the capabilities of Hunyuan3D-2 (reference:
delldu/Hunyuan3D-2), designed TPU-first:

* models are pure functions over parameter pytrees (bf16 params, fp32 norms),
* samplers are ``lax.scan`` loops compiled once under ``jax.jit``,
* the latent→SDF volume decode is a batched fixed-shape grid kernel
  (dense / hierarchical fixed-capacity refinement / top-k KV pruning),
* surface extraction and texture baking run as vectorized array programs,
* multi-chip scaling uses ``jax.sharding.Mesh`` + ``NamedSharding`` over ICI.

Public API parity with the reference (hy3dgen):
    Hunyuan3DDiTFlowMatchingPipeline  — image → mesh     (shape generation)
    Hunyuan3DPaintPipeline            — mesh + image → textured mesh
    ShapeVAE.latents2mesh, enable_flashvdm, FloaterRemover, FaceReducer, ...
"""

__version__ = "0.1.0"

import os as _os


def _host_fingerprint() -> str:
    """Short hash of the execution host's CPU features + jaxlib version.

    XLA:CPU AOT executables are machine-specific: loading a cached
    executable compiled on a host with different CPU features SIGILL/aborts
    at execution (observed: a stale .jax_cache_cpu from another machine
    crashed the test suite; round 1's multichip dryrun failed the same way
    on a libtpu version skew). Keying the cache dir by host fingerprint
    makes stale cross-machine entries unreachable instead of fatal."""
    import hashlib
    import platform as _platform

    bits = [_platform.machine()]
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    bits.append(line.strip())
                    break
    except OSError:
        pass
    try:
        import jaxlib

        bits.append(jaxlib.__version__)
    except Exception:
        pass
    return hashlib.sha1(" ".join(bits).encode()).hexdigest()[:10]


def _setup_compilation_cache():
    """Persistent XLA/Mosaic compilation cache (first Pallas compile through
    the remote-compile tunnel costs minutes; cache it across processes)."""
    try:
        import jax

        platform = (_os.environ.get("JAX_PLATFORMS", "axon") or "cpu").split(",")[0]
        # XLA:CPU caches AOT host executables → must be keyed by host CPU
        # features (stale cross-machine entries SIGILL). TPU caches hold
        # device executables whose cache key already includes the backend
        # compiler/libtpu version, so they are shared host-agnostically —
        # this lets the driver host reuse caches prewarmed during the build.
        suffix = f"_{_host_fingerprint()}" if platform == "cpu" else ""
        cache_dir = _os.environ.get(
            "HY3D_TPU_CACHE",
            _os.path.join(_os.path.dirname(__file__), "..",
                          f".jax_cache_{platform}{suffix}"))
        jax.config.update("jax_compilation_cache_dir", _os.path.abspath(cache_dir))
        # 0.1 s threshold: under the axon remote-compile tunnel even tiny
        # programs cost ~0.5 s to compile, so caching them is a net win.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


_setup_compilation_cache()

from hunyuan3d2_tpu.utils.logger import get_logger  # noqa: F401
from hunyuan3d2_tpu.utils.timer import synchronize_timer  # noqa: F401


def _lazy(name):
    import importlib

    def load():
        mod, attr = name.rsplit(".", 1)
        return getattr(importlib.import_module(mod), attr)

    return load


# Lazy imports so that `import hunyuan3d2_tpu` stays cheap.
def __getattr__(attr):
    table = {
        "Hunyuan3DDiTFlowMatchingPipeline": "hunyuan3d2_tpu.pipelines.shapegen.Hunyuan3DDiTFlowMatchingPipeline",
        "Hunyuan3DDiTPipeline": "hunyuan3d2_tpu.pipelines.shapegen.Hunyuan3DDiTPipeline",
        "Hunyuan3DPaintPipeline": "hunyuan3d2_tpu.pipelines.texgen.Hunyuan3DPaintPipeline",
        "ShapeVAE": "hunyuan3d2_tpu.models.shapevae.ShapeVAE",
        "Mesh": "hunyuan3d2_tpu.geometry.mesh.Mesh",
    }
    if attr in table:
        return _lazy(table[attr])()
    raise AttributeError(f"module {__name__!r} has no attribute {attr!r}")
