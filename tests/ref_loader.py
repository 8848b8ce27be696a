"""Load modules of the actual reference code base (/root/reference) for
direct-execution parity tests, bypassing package ``__init__`` files whose
imports (trimesh, skimage, diffusers) are absent in this image.

Two mechanisms:

* ``load_ref("hy3dgen.shapegen.models.denoisers.hunyuan3ddit")`` — registers
  stub *package* modules (with ``__path__`` pointing at the reference dirs,
  but WITHOUT executing their ``__init__.py``) for every ancestor, then
  imports the leaf module normally so its relative imports resolve.
* ``diffusers_shim()`` — a context manager installing a minimal ``diffusers``
  stand-in (ConfigMixin / register_to_config / SchedulerMixin / BaseOutput /
  logging) sufficient to execute hy3dgen/shapegen/schedulers.py. Removed on
  exit so the rest of the suite still sees diffusers as absent.

The reference content is PUBLIC UNTRUSTED CODE under test: we execute its
model math on random weights and compare outputs — nothing from it is
imported into the production package.
"""

from __future__ import annotations

import contextlib
import functools
import importlib
import importlib.util
import inspect
import os
import sys
import types

REF_ROOT = "/root/reference"


def _register_stub_package(fullname: str, path: str) -> None:
    """Register ``fullname`` as a namespace-style package at ``path`` without
    executing its __init__.py."""
    if fullname in sys.modules:
        return
    mod = types.ModuleType(fullname)
    mod.__path__ = [path]
    mod.__package__ = fullname
    sys.modules[fullname] = mod


def _ensure_todos_stub() -> None:
    """The delldu fork laces modules with ``import todos`` (a debug-print
    helper package not present in this image). Register an inert stand-in so
    those reference modules can execute."""
    if "todos" in sys.modules:
        return
    todos = types.ModuleType("todos")
    debug = types.ModuleType("todos.debug")
    debug.output_var = lambda *a, **k: None
    todos.debug = debug
    sys.modules["todos"] = todos
    sys.modules["todos.debug"] = debug


@functools.lru_cache(maxsize=None)
def load_ref(dotted: str):
    """Import ``dotted`` (e.g. 'hy3dgen.shapegen.utils') from /root/reference
    with stubbed ancestor packages. Results are cached per process."""
    _ensure_todos_stub()
    parts = dotted.split(".")
    for i in range(1, len(parts)):
        pkg = ".".join(parts[:i])
        pkg_dir = os.path.join(REF_ROOT, *parts[:i])
        assert os.path.isdir(pkg_dir), f"missing reference dir {pkg_dir}"
        _register_stub_package(pkg, pkg_dir)
    leaf_py = os.path.join(REF_ROOT, *parts) + ".py"
    assert os.path.isfile(leaf_py), f"missing reference module {leaf_py}"
    spec = importlib.util.spec_from_file_location(dotted, leaf_py)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = ".".join(parts[:-1])
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


@contextlib.contextmanager
def diffusers_shim():
    """Temporarily provide the four diffusers symbols the reference
    schedulers import. Only config bookkeeping — no scheduler math lives in
    the shim (the reference file under test implements all of it)."""
    if "diffusers" in sys.modules:  # real diffusers present: nothing to do
        yield
        return

    import logging as _logging

    class ConfigMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            sig = inspect.signature(init)
            bound = sig.bind(self, *args, **kwargs)
            bound.apply_defaults()
            cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
            self.config = types.SimpleNamespace(**cfg)
            # diffusers also exposes config entries as attributes
            for k, v in cfg.items():
                if not hasattr(self, k):
                    try:
                        setattr(self, k, v)
                    except AttributeError:
                        pass
            return init(self, *args, **kwargs)

        return wrapped

    class SchedulerMixin:
        config_name = "scheduler_config.json"

    class BaseOutput:
        def __init_subclass__(cls, **kw):
            super().__init_subclass__(**kw)

    class _Logging:
        @staticmethod
        def get_logger(name=None):
            return _logging.getLogger(name or "diffusers-shim")

    diffusers = types.ModuleType("diffusers")
    cfg_mod = types.ModuleType("diffusers.configuration_utils")
    cfg_mod.ConfigMixin = ConfigMixin
    cfg_mod.register_to_config = register_to_config
    scheds = types.ModuleType("diffusers.schedulers")
    sched_utils = types.ModuleType("diffusers.schedulers.scheduling_utils")
    sched_utils.SchedulerMixin = SchedulerMixin
    utils_mod = types.ModuleType("diffusers.utils")
    utils_mod.BaseOutput = BaseOutput
    utils_mod.logging = _Logging()
    diffusers.configuration_utils = cfg_mod
    diffusers.schedulers = scheds
    diffusers.utils = utils_mod
    scheds.scheduling_utils = sched_utils

    installed = {
        "diffusers": diffusers,
        "diffusers.configuration_utils": cfg_mod,
        "diffusers.schedulers": scheds,
        "diffusers.schedulers.scheduling_utils": sched_utils,
        "diffusers.utils": utils_mod,
    }
    sys.modules.update(installed)
    try:
        yield
    finally:
        for k in installed:
            sys.modules.pop(k, None)
