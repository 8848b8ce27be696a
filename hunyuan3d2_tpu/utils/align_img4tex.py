"""Img2img / ControlNet texture-alignment helpers.

Behavioral parity: reference hy3dgen/texgen/utils/alignImg4Tex_utils.py
(Img2img_Control_Ip_adapter :21 — SD1.5 ControlNet-depth + IP-Adapter;
HesModel :71 — SDXL ControlNet img2img). Both are UNUSED by the reference's
main texture path (constructed for experimentation only; texgen/pipelines.py
never instantiates them), so no ControlNet stack ships here. The classes
keep the reference call contract:

* with a ``backend`` callable (e.g. a ControlNet img2img pipeline, or the
  in-repo JAX diffusion stack wrapped to accept image+control), it runs it;
* without one, the call degrades to an identity pass with a logged warning —
  an explicit, documented no-op rather than an error, because the reference
  pipeline produces identical results without this stage.
"""

from __future__ import annotations

from PIL import Image

from hunyuan3d2_tpu.utils.logger import get_logger

logger = get_logger("hunyuan3d2_tpu.align_img4tex")


class Img2img_Control_Ip_adapter:
    def __init__(self, device=None, backend=None):
        self.backend = backend

    def __call__(self, image: Image.Image, depth_image: Image.Image,
                 prompt: str = "", strength: float = 0.8,
                 guidance_scale: float = 7.5, **kwargs) -> Image.Image:
        if self.backend is None:
            logger.warning(
                "align_img4tex: no ControlNet backend configured — returning "
                "the input unchanged (the reference main path never runs "
                "this stage; alignImg4Tex_utils is experimentation-only)")
            return image
        return self.backend(image=image, control=depth_image, prompt=prompt,
                            strength=strength, guidance_scale=guidance_scale)


class HesModel(Img2img_Control_Ip_adapter):
    """SDXL img2img variant (parity: alignImg4Tex_utils.py:71)."""
