"""De-lighting (shadow/highlight removal) for input images.

Behavioral parity: reference hy3dgen/texgen/utils/dehighlight_utils.py
(Light_Shadow_Remover :23 — an InstructPix2Pix SD pipeline + RGB
moment-matching recorrection :38-67). The diffusion delight model is
**disabled in the reference fork** (texgen/pipelines.py:114-117); here the
``recorrect_rgb`` statistics pass is implemented natively and the diffusion
stage hooks in when a delight checkpoint is provided.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def recorrect_rgb(src: np.ndarray, target: np.ndarray, alpha_channel=None,
                  central_factor: float = 0.8) -> np.ndarray:
    """Match src's per-channel mean/std to target's over the central crop
    (parity: dehighlight_utils.py:38-67)."""
    h, w = src.shape[:2]
    cy0, cy1 = int(h * (1 - central_factor) / 2), int(h * (1 + central_factor) / 2)
    cx0, cx1 = int(w * (1 - central_factor) / 2), int(w * (1 + central_factor) / 2)
    out = src.astype(np.float32).copy()
    sc = src[cy0:cy1, cx0:cx1].reshape(-1, src.shape[-1])
    tc = target[cy0:cy1, cx0:cx1].reshape(-1, target.shape[-1])
    if alpha_channel is not None:
        sel = alpha_channel[cy0:cy1, cx0:cx1].reshape(-1) > 0.5
        if sel.any():
            sc, tc = sc[sel], tc[sel]
    mu_s, std_s = sc.mean(0), sc.std(0) + 1e-6
    mu_t, std_t = tc.mean(0), tc.std(0) + 1e-6
    out = (out - mu_s) / std_s * std_t + mu_t
    return np.clip(out, 0.0, 1.0)


def _diffusers_delight(ckpt_path: str, device: str = "cpu"):
    """Exact reference construction (dehighlight_utils.py:23-37):
    InstructPix2Pix + EulerAncestral, cfg_image 1.5 / cfg_text 1.0."""
    import torch
    from diffusers import (
        EulerAncestralDiscreteScheduler,
        StableDiffusionInstructPix2PixPipeline,
    )

    cuda = device.startswith("cuda") and torch.cuda.is_available()
    pipe = StableDiffusionInstructPix2PixPipeline.from_pretrained(
        ckpt_path, torch_dtype=torch.float16 if cuda else torch.float32,
        safety_checker=None)
    pipe.scheduler = EulerAncestralDiscreteScheduler.from_config(
        pipe.scheduler.config)
    pipe.set_progress_bar_config(disable=True)
    pipe = pipe.to("cuda" if cuda else "cpu")

    def run(rgb01):
        import numpy as np

        image = Image.fromarray((np.clip(rgb01, 0, 1) * 255).astype(np.uint8))
        with torch.no_grad():
            out = pipe(prompt="", image=image, generator=torch.manual_seed(42),
                       height=512, width=512, guidance_scale=1.0,
                       image_guidance_scale=1.5, num_inference_steps=50,
                       ).images[0]
        return np.asarray(out).astype(np.float32) / 255.0

    return run


class Light_Shadow_Remover:
    """Parity API: dehighlight_utils.py:23-110. With a delight checkpoint
    path (and diffusers installed) this runs the reference InstructPix2Pix
    construction; otherwise the statistics recorrection only (a no-op on an
    already evenly-lit cutout — which is why the fork disables the stage)."""

    def __init__(self, config=None, pipeline=None):
        self.config = config
        self.pipeline = pipeline  # optional diffusion delight model
        ckpt = getattr(config, "light_remover_ckpt_path", None) if config else None
        if pipeline is None and ckpt:
            # JAX-native InstructPix2Pix stack first (runs on TPU); the
            # torch/diffusers construction only as a fallback (diffusers is
            # not importable in this image)
            try:
                from hunyuan3d2_tpu.pipelines.delight import DelightPipeline

                self.pipeline = DelightPipeline.from_pretrained(ckpt)
            except Exception:
                try:
                    self.pipeline = _diffusers_delight(
                        ckpt, getattr(config, "device", "cpu"))
                except ImportError:
                    pass

    def __call__(self, image: Image.Image) -> Image.Image:
        rgba = np.asarray(image.convert("RGBA")).astype(np.float32) / 255.0
        rgb, alpha = rgba[..., :3], rgba[..., 3]
        if self.pipeline is not None:
            out = self.pipeline(rgb)
            out = recorrect_rgb(out, rgb, alpha)
        else:
            out = rgb
        out = out * alpha[..., None] + (1 - alpha[..., None])
        return Image.fromarray((np.clip(out, 0, 1) * 255).astype(np.uint8))
