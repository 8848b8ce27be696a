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


class Light_Shadow_Remover:
    """Parity API: dehighlight_utils.py:23-110. Without a delight diffusion
    checkpoint this applies the statistics recorrection only (a no-op on an
    already evenly-lit cutout — which is why the fork disables the stage)."""

    def __init__(self, config=None, pipeline=None):
        self.config = config
        self.pipeline = pipeline  # optional diffusion delight model

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
