"""Super-resolution of generated views.

Behavioral parity: reference hy3dgen/texgen/utils/imagesuper_utils.py
(Image_Super_Net :19 — SD x4 upscaler, **disabled in the fork**,
texgen/pipelines.py:238). Default implementation is a high-quality Lanczos
×4 upscale with unsharp masking; a diffusion upscaler hooks in when provided.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageFilter


class Image_Super_Net:
    def __init__(self, config=None, pipeline=None, scale: int = 4):
        self.pipeline = pipeline
        self.scale = scale

    def __call__(self, image: Image.Image, prompt: str = "") -> Image.Image:
        if self.pipeline is not None:
            return self.pipeline(image, prompt=prompt)
        w, h = image.size
        up = image.resize((w * self.scale, h * self.scale), Image.LANCZOS)
        return up.filter(ImageFilter.UnsharpMask(radius=2, percent=60, threshold=2))
