"""Img2img / ControlNet texture-alignment helpers.

Behavioral parity: reference hy3dgen/texgen/utils/alignImg4Tex_utils.py
(Img2img_Control_Ip_adapter :21 — SD1.5 ControlNet-depth + IP-Adapter;
HesModel :71 — SDXL ControlNet img2img). The real JAX stacks live in
pipelines/align.py (ControlNet model: models/controlnet.py, IP-Adapter:
models/ip_adapter.py); this module keeps the reference import path
(`utils.align_img4tex`) plus the legacy ``backend`` escape hatch.
"""

from __future__ import annotations

from PIL import Image

from hunyuan3d2_tpu.pipelines.align import ControlNetSDPipeline, HesModel
from hunyuan3d2_tpu.pipelines.align import (
    Img2img_Control_Ip_adapter as _Img2img,
)
from hunyuan3d2_tpu.utils.logger import get_logger

logger = get_logger("hunyuan3d2_tpu.align_img4tex")

__all__ = ["Img2img_Control_Ip_adapter", "HesModel", "ControlNetSDPipeline"]


class Img2img_Control_Ip_adapter(_Img2img):
    """Adds the legacy ``backend`` kwarg: an external callable
    (image, control, prompt, …) → image used INSTEAD of the JAX stack."""

    def __init__(self, device=None, backend=None, pipeline=None):
        self.backend = backend
        if backend is None:
            super().__init__(device=device, pipeline=pipeline)

    def __call__(self, prompt, control_image, ip_adapter_image=None,
                 negative_prompt="", **kwargs) -> Image.Image:
        if self.backend is not None:
            return self.backend(image=ip_adapter_image, control=control_image,
                                prompt=prompt, **kwargs)
        return super().__call__(prompt, control_image, ip_adapter_image,
                                negative_prompt, **kwargs)
