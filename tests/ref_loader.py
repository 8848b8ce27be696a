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


@contextlib.contextmanager
def paint_shim():
    """diffusers stand-in sufficient to import and EXECUTE the reference
    paint stack (hunyuanpaint/unet/modules.py and hunyuanpaint/pipeline.py).

    Only two shim classes carry math — ``Attention`` (vanilla multi-head
    attention, exactly what diffusers' AttnProcessor2_0 computes via
    F.scaled_dot_product_attention) and ``BasicTransformerBlock`` (the stock
    SD "layer_norm" block: LN→self-attn→LN→cross-attn→LN→GEGLU FF). The code
    UNDER TEST — Basic2p5DTransformerBlock's ref/mv-attention orchestration,
    the 'w'/'r' condition cache, voxel masks, DDIMSolver — is all reference
    code executing unmodified. Everything else in the shim is inert (only
    needed so module-level imports resolve)."""
    if "diffusers" in sys.modules:
        yield
        return

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Attention(nn.Module):
        def __init__(self, query_dim, heads=8, dim_head=64, dropout=0.0,
                     bias=False, cross_attention_dim=None,
                     upcast_attention=False, out_bias=True, **kw):
            super().__init__()
            inner = heads * dim_head
            kv_dim = cross_attention_dim or query_dim
            self.heads = heads
            self.upcast_attention = upcast_attention
            self.to_q = nn.Linear(query_dim, inner, bias=bias)
            self.to_k = nn.Linear(kv_dim, inner, bias=bias)
            self.to_v = nn.Linear(kv_dim, inner, bias=bias)
            self.to_out = nn.ModuleList(
                [nn.Linear(inner, query_dim, bias=out_bias),
                 nn.Dropout(dropout)])

        def forward(self, hidden_states, encoder_hidden_states=None,
                    attention_mask=None, **kwargs):
            # extra kwargs (e.g. the turbo path's position_indices) are
            # accepted and ignored, like a stock processor would
            kv = (encoder_hidden_states if encoder_hidden_states is not None
                  else hidden_states)
            b, l, _ = hidden_states.shape
            q, k, v = self.to_q(hidden_states), self.to_k(kv), self.to_v(kv)

            def sh(t):
                return t.reshape(b, -1, self.heads,
                                 t.shape[-1] // self.heads).transpose(1, 2)

            mask = None
            if attention_mask is not None:
                mask = attention_mask.to(torch.bool)
                if mask.ndim == 3:
                    mask = mask[:, None]
            out = F.scaled_dot_product_attention(sh(q), sh(k), sh(v),
                                                 attn_mask=mask)
            out = out.transpose(1, 2).reshape(b, l, -1)
            return self.to_out[1](self.to_out[0](out))

    class _GEGLU(nn.Module):
        def __init__(self, dim, inner):
            super().__init__()
            self.proj = nn.Linear(dim, inner * 2)

        def forward(self, x):
            h, gate = self.proj(x).chunk(2, dim=-1)
            return h * F.gelu(gate)

    class _FeedForward(nn.Module):
        def __init__(self, dim, mult=4):
            super().__init__()
            self.net = nn.ModuleList([_GEGLU(dim, mult * dim), nn.Identity(),
                                      nn.Linear(mult * dim, dim)])

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    class BasicTransformerBlock(nn.Module):
        def __init__(self, dim, num_attention_heads, attention_head_dim,
                     cross_attention_dim=None, **kw):
            super().__init__()
            self.dim = dim
            self.num_attention_heads = num_attention_heads
            self.attention_head_dim = attention_head_dim
            self.dropout = 0.0
            self.attention_bias = False
            self.norm_type = "layer_norm"
            self.pos_embed = None
            self.only_cross_attention = False
            self._chunk_size = None
            self._chunk_dim = 0
            self.norm1 = nn.LayerNorm(dim)
            self.attn1 = Attention(dim, heads=num_attention_heads,
                                   dim_head=attention_head_dim)
            self.norm2 = nn.LayerNorm(dim)
            self.attn2 = Attention(dim, heads=num_attention_heads,
                                   dim_head=attention_head_dim,
                                   cross_attention_dim=cross_attention_dim)
            self.norm3 = nn.LayerNorm(dim)
            self.ff = _FeedForward(dim)

    def _inert(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    class _Cls:  # inert placeholder base/class
        def __init__(self, *a, **k):
            pass

    def _fn(*a, **k):
        return None

    import logging as _logging

    class _Logging:
        @staticmethod
        def get_logger(name=None):
            return _logging.getLogger(name or "diffusers-shim")

    diffusers = _inert(
        "diffusers", AutoencoderKL=_Cls, DDPMScheduler=_Cls,
        DiffusionPipeline=_Cls, EulerAncestralDiscreteScheduler=_Cls,
        UNet2DConditionModel=_Cls, ImagePipelineOutput=_Cls)
    models = _inert("diffusers.models", UNet2DConditionModel=_Cls)
    attn_proc = _inert("diffusers.models.attention_processor",
                       Attention=Attention)
    transformers_pkg = _inert("diffusers.models.transformers")
    t2d = _inert("diffusers.models.transformers.transformer_2d",
                 BasicTransformerBlock=BasicTransformerBlock)
    callbacks = _inert("diffusers.callbacks", MultiPipelineCallbacks=_Cls,
                       PipelineCallback=_Cls)
    img_proc = _inert("diffusers.image_processor", PipelineImageInput=_Cls,
                      VaeImageProcessor=_Cls)
    pipelines = _inert("diffusers.pipelines")
    sd_pkg = _inert("diffusers.pipelines.stable_diffusion")
    sd_out = _inert("diffusers.pipelines.stable_diffusion.pipeline_output",
                    StableDiffusionPipelineOutput=_Cls)
    sd_pipe = _inert(
        "diffusers.pipelines.stable_diffusion.pipeline_stable_diffusion",
        StableDiffusionPipeline=_Cls, retrieve_timesteps=_fn,
        rescale_noise_cfg=_fn)
    scheds = _inert("diffusers.schedulers", KarrasDiffusionSchedulers=_Cls,
                    LCMScheduler=_Cls)
    utils_mod = _inert("diffusers.utils", deprecate=_fn, BaseOutput=_Cls,
                       logging=_Logging())

    installed = {m.__name__: m for m in (
        diffusers, models, attn_proc, transformers_pkg, t2d, callbacks,
        img_proc, pipelines, sd_pkg, sd_out, sd_pipe, scheds, utils_mod)}
    diffusers.models = models
    diffusers.image_processor = img_proc
    diffusers.utils = utils_mod
    sys.modules.update(installed)
    try:
        yield
    finally:
        for k in installed:
            sys.modules.pop(k, None)
