"""Background removal.

Behavioral parity: reference hy3dgen/rembg.py:19-26 (BackgroundRemover — an
onnxruntime u2net session with white-transparent bgcolor). onnxruntime isn't
in this image, so the default implementation:
  * passes through images that already carry a real alpha channel (the common
    path: the API/gradio inputs are RGBA cutouts), and
  * otherwise segments with cv2 GrabCut seeded by a centered rectangle plus a
    border-color prior — a dependency-free approximation.
If a `rembg` package is importable it is used instead.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


class BackgroundRemover:
    def __init__(self):
        self._rembg = None
        try:  # optional external implementation
            import rembg  # type: ignore

            self._rembg = rembg.new_session()
        except Exception:
            self._rembg = None

    def __call__(self, image: Image.Image) -> Image.Image:
        if self._rembg is not None:
            import rembg  # type: ignore

            return rembg.remove(image, session=self._rembg,
                                bgcolor=[255, 255, 255, 0])
        rgba = np.asarray(image.convert("RGBA"))
        alpha = rgba[..., 3]
        if alpha.min() < 250:  # already has meaningful alpha
            return image.convert("RGBA")
        return Image.fromarray(self._grabcut(rgba[..., :3]))

    @staticmethod
    def _grabcut(rgb: np.ndarray) -> np.ndarray:
        import cv2

        h, w = rgb.shape[:2]
        mask = np.zeros((h, w), np.uint8)
        # border-color prior: pixels close to the median border color are
        # marked probable-background
        border = np.concatenate([rgb[0], rgb[-1], rgb[:, 0], rgb[:, -1]])
        bg = np.median(border, axis=0)
        dist = np.linalg.norm(rgb.astype(np.float32) - bg, axis=-1)
        mask[:] = cv2.GC_PR_FGD
        mask[dist < 30] = cv2.GC_PR_BGD
        rect = (w // 16, h // 16, w - w // 8, h - h // 8)
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        try:
            cv2.grabCut(rgb, mask, rect, bgd, fgd, 3, cv2.GC_INIT_WITH_MASK)
        except cv2.error:
            cv2.grabCut(rgb, mask, rect, bgd, fgd, 3, cv2.GC_INIT_WITH_RECT)
        fg = ((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)).astype(np.uint8)
        out = np.dstack([rgb, fg * 255])
        return out
