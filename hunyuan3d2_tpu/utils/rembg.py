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
        """GrabCut with photo-robust priors (quality-tested on real
        photographs in tests/test_rembg_quality.py):

        * multi-cluster border prior — k-means over the frame pixels marks
          anything close to ANY border color probable-background (a single
          median fails on multi-colored backdrops, measured: the all-FGD
          degenerate output on matplotlib's grace_hopper.jpg);
        * the outer 2% frame is definite background (object photos don't
          touch the frame);
        * largest-connected-component + morphological close cleanup.
        """
        import cv2

        h, w = rgb.shape[:2]
        mask = np.full((h, w), cv2.GC_PR_FGD, np.uint8)
        border = np.concatenate([rgb[0], rgb[-1], rgb[:, 0], rgb[:, -1]]
                                ).astype(np.float32)
        crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 10, 1.0)
        try:
            _, _, centers = cv2.kmeans(border, 4, None, crit, 3,
                                       cv2.KMEANS_PP_CENTERS)
        except cv2.error:
            centers = np.median(border, axis=0)[None]
        dist = np.min(np.linalg.norm(
            rgb.astype(np.float32)[:, :, None, :] - centers[None, None],
            axis=-1), axis=-1)
        mask[dist < 35] = cv2.GC_PR_BGD
        m = max(2, int(0.02 * min(h, w)))
        mask[:m] = cv2.GC_BGD
        mask[-m:] = cv2.GC_BGD
        mask[:, :m] = cv2.GC_BGD
        mask[:, -m:] = cv2.GC_BGD
        ch, cw = int(0.12 * h), int(0.12 * w)
        mask[h // 2 - ch:h // 2 + ch, w // 2 - cw:w // 2 + cw] = cv2.GC_PR_FGD
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        rect = (w // 16, h // 16, w - w // 8, h - h // 8)
        try:
            cv2.grabCut(rgb, mask, None, bgd, fgd, 5, cv2.GC_INIT_WITH_MASK)
        except cv2.error:
            cv2.grabCut(rgb, mask, rect, bgd, fgd, 3, cv2.GC_INIT_WITH_RECT)
        fg = ((mask == cv2.GC_FGD) | (mask == cv2.GC_PR_FGD)).astype(np.uint8)
        n, cc = cv2.connectedComponents(fg)
        if n > 1:
            sizes = np.bincount(cc.ravel())
            sizes[0] = 0
            fg = (cc == sizes.argmax()).astype(np.uint8)
        fg = cv2.morphologyEx(fg, cv2.MORPH_CLOSE, np.ones((7, 7), np.uint8))
        return np.dstack([rgb, fg * 255])
