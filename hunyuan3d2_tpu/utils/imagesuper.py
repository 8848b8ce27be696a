"""Super-resolution of generated views.

Behavioral parity: reference hy3dgen/texgen/utils/imagesuper_utils.py
(Image_Super_Net :19 — SD x4 upscaler, **disabled in the fork**,
texgen/pipelines.py:238). Default implementation is a high-quality Lanczos
×4 upscale with unsharp masking; a diffusion upscaler hooks in when provided.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageFilter


def _diffusers_upscaler(device: str = "cpu"):
    """Exact reference construction (imagesuper_utils.py:19-24): SD x4
    upscaler, 5 inference steps."""
    import torch
    from diffusers import StableDiffusionUpscalePipeline

    cuda = device.startswith("cuda") and torch.cuda.is_available()
    pipe = StableDiffusionUpscalePipeline.from_pretrained(
        "stabilityai/stable-diffusion-x4-upscaler",
        torch_dtype=torch.float16 if cuda else torch.float32,
    ).to("cuda" if cuda else "cpu")
    pipe.set_progress_bar_config(disable=True)

    def run(image, prompt=""):
        import torch as _t

        with _t.no_grad():
            return pipe(prompt=[prompt], image=image,
                        num_inference_steps=5).images[0]

    return run


class Image_Super_Net:
    def __init__(self, config=None, pipeline=None, scale: int = 4,
                 use_diffusion: bool = False):
        self.pipeline = pipeline
        self.scale = scale
        ckpt = getattr(config, "super_res_ckpt_path", None) if config else None
        if pipeline is None and ckpt:
            # JAX-native x4 upscaler stack (runs on TPU) when a local
            # checkpoint directory is provided
            try:
                from hunyuan3d2_tpu.io.diffusers_maps import (
                    load_upscale_pipeline,
                )
                from hunyuan3d2_tpu.pipelines.upscale import UpscalePipeline

                self.pipeline = load_upscale_pipeline(UpscalePipeline, ckpt)
            except Exception:
                pass
        if self.pipeline is None and use_diffusion:
            try:
                self.pipeline = _diffusers_upscaler(
                    getattr(config, "device", "cpu") if config else "cpu")
            except ImportError:
                pass

    def __call__(self, image: Image.Image, prompt: str = "") -> Image.Image:
        if self.pipeline is not None:
            return self.pipeline(image, prompt=prompt)
        w, h = image.size
        up = image.resize((w * self.scale, h * self.scale), Image.LANCZOS)
        return up.filter(ImageFilter.UnsharpMask(radius=2, percent=60, threshold=2))
