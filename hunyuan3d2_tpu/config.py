"""Config registry: YAML ``target/params`` → our classes.

Behavioral parity: reference hy3dgen/shapegen/pipelines.py:113-128
(get_obj_from_str / instantiate_from_config — the de-facto model config
system used by every checkpoint's config.yaml). Reference checkpoints name
torch classes (``hy3dgen.shapegen...``); the REGISTRY maps those names onto
the TPU-native equivalents so unchanged config.yaml files keep working.
"""

from __future__ import annotations

import importlib

# reference class paths → our implementations
REGISTRY = {
    "hy3dgen.shapegen.models.Hunyuan3DDiT": "hunyuan3d2_tpu.models.dit.Hunyuan3DDiT",
    "hy3dgen.shapegen.models.ShapeVAE": "hunyuan3d2_tpu.models.shapevae.ShapeVAE",
    "hy3dgen.shapegen.models.denoisers.Hunyuan3DDiT": "hunyuan3d2_tpu.models.dit.Hunyuan3DDiT",
    "hy3dgen.shapegen.models.autoencoders.ShapeVAE": "hunyuan3d2_tpu.models.shapevae.ShapeVAE",
    "hy3dgen.shapegen.models.conditioner.SingleImageEncoder":
        "hunyuan3d2_tpu.models.conditioner.SingleImageEncoder",
    "hy3dgen.shapegen.models.conditioner.DualImageEncoder":
        "hunyuan3d2_tpu.models.conditioner.DualImageEncoder",
    "hy3dgen.shapegen.models.conditioner.DinoImageEncoder":
        "hunyuan3d2_tpu.models.conditioner.DinoImageEncoder",
    "hy3dgen.shapegen.models.conditioner.DinoImageEncoderMV":
        "hunyuan3d2_tpu.models.conditioner.DinoImageEncoderMV",
    "hy3dgen.shapegen.schedulers.FlowMatchEulerDiscreteScheduler":
        "hunyuan3d2_tpu.pipelines.schedulers.FlowMatchEulerDiscreteScheduler",
    "hy3dgen.shapegen.schedulers.ConsistencyFlowMatchEulerDiscreteScheduler":
        "hunyuan3d2_tpu.pipelines.schedulers.ConsistencyFlowMatchEulerDiscreteScheduler",
    "hy3dgen.shapegen.preprocessors.ImageProcessorV2":
        "hunyuan3d2_tpu.utils.imageproc.ImageProcessorV2",
    "hy3dgen.shapegen.preprocessors.MVImageProcessorV2":
        "hunyuan3d2_tpu.utils.imageproc.MVImageProcessorV2",
}


def get_obj_from_str(string: str, reload: bool = False):
    string = REGISTRY.get(string, string)
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: dict, **kwargs):
    """Parity: pipelines.py:121-128."""
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    cls = get_obj_from_str(config["target"])
    params = dict(config.get("params", {}) or {})
    params.update(kwargs)
    return cls(**params)
