"""Img2img / ControlNet texture-alignment helpers.

Behavioral parity: reference hy3dgen/texgen/utils/alignImg4Tex_utils.py
(Img2img_Control_Ip_adapter :21 — SD1.5 ControlNet-depth + IP-Adapter;
HesModel :71 — SDXL ControlNet img2img). Both are UNUSED by the reference's
main texture path (constructed for experimentation only). The classes keep
the call contract; diffusion backends plug in when available.
"""

from __future__ import annotations

from PIL import Image


class Img2img_Control_Ip_adapter:
    def __init__(self, device=None, backend=None):
        self.backend = backend

    def __call__(self, image: Image.Image, depth_image: Image.Image,
                 prompt: str = "", strength: float = 0.8,
                 guidance_scale: float = 7.5, **kwargs) -> Image.Image:
        if self.backend is None:
            raise NotImplementedError(
                "ControlNet img2img requires a diffusion backend; the main "
                "texture path does not use this helper (reference parity: "
                "alignImg4Tex_utils is unused by texgen/pipelines.py).")
        return self.backend(image=image, control=depth_image, prompt=prompt,
                            strength=strength, guidance_scale=guidance_scale)


class HesModel(Img2img_Control_Ip_adapter):
    """SDXL img2img variant (parity: alignImg4Tex_utils.py:71)."""
