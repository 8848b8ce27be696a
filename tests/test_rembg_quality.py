"""Background-removal quality on REAL photographs (VERDICT r3 #9).

The reference uses an onnx u2net session (hy3dgen/rembg.py:19-26); this
image has no onnxruntime, so the framework ships a GrabCut stand-in. These
tests hold it to a measurable bar on photographic content:

* ground-truth composites built from matplotlib's bundled real photo
  (grace_hopper.jpg): a photo-textured object with a KNOWN alpha over (a) a
  distinct natural-gradient background and (b) the same photo flipped — the
  adversarial same-color-statistics case. IoU vs the true mask.
* the raw portrait photo: a sane, non-degenerate segmentation (the old
  single-median border prior returned all-foreground here).
* alpha passthrough and `rembg` package autodetect wiring.
"""

import sys
import types

import numpy as np
import pytest
from PIL import Image

from hunyuan3d2_tpu.utils.rembg import BackgroundRemover

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def photo():
    matplotlib = pytest.importorskip("matplotlib")
    p = matplotlib.cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)
    return Image.open(p).convert("RGB")


def _blob_mask(h, w, cx, cy, rx, ry):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return ((xx - cx) ** 2 / rx ** 2 + (yy - cy) ** 2 / ry ** 2) < 1.0


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_composite_on_distinct_background(photo):
    h = w = 480
    tex = np.asarray(photo.resize((w, h)))
    # natural-ish sky gradient + sensor noise background
    yy = np.linspace(0, 1, h)[:, None, None]
    bg = (np.array([140, 170, 210]) * (1 - 0.4 * yy)
          + np.random.RandomState(0).normal(0, 4, (h, w, 3)))
    blob = _blob_mask(h, w, 240, 250, 150, 115)
    comp = np.where(blob[..., None], tex, bg).clip(0, 255).astype(np.uint8)
    out = BackgroundRemover()(Image.fromarray(comp))
    alpha = np.asarray(out)[..., 3] > 127
    assert _iou(alpha, blob) > 0.75, _iou(alpha, blob)


def test_composite_on_same_photo_background(photo):
    """Adversarial: the background is the SAME photo flipped — matching
    color statistics. The u2net-class bar is unreachable for GrabCut; the
    stand-in must still localize the object (IoU > 0.55, measured 0.63)."""
    h = w = 480
    base = np.asarray(photo.resize((w, h)))
    blob = _blob_mask(h, w, 240, 250, 156, 120)
    comp = np.where(blob[..., None], base, base[::-1]).astype(np.uint8)
    out = BackgroundRemover()(Image.fromarray(comp))
    alpha = np.asarray(out)[..., 3] > 127
    assert _iou(alpha, blob) > 0.55, _iou(alpha, blob)


def test_portrait_photo_not_degenerate(photo):
    """The raw portrait: segmentation must be non-degenerate (the r3
    heuristic returned ALL-foreground here) and centered on the subject."""
    out = BackgroundRemover()(photo)
    alpha = np.asarray(out)[..., 3] > 127
    frac = alpha.mean()
    assert 0.08 < frac < 0.85, frac
    ys, xs = np.nonzero(alpha)
    h, w = alpha.shape
    # subject bbox includes the image center
    assert ys.min() < h // 2 < ys.max()
    assert xs.min() < w // 2 < xs.max()


def test_alpha_passthrough():
    rgba = np.zeros((32, 32, 4), np.uint8)
    rgba[8:24, 8:24] = [200, 10, 10, 255]
    out = BackgroundRemover()(Image.fromarray(rgba, "RGBA"))
    np.testing.assert_array_equal(np.asarray(out), rgba)


def test_rembg_package_autodetect(monkeypatch):
    """When a `rembg` package is importable, it must be preferred over the
    GrabCut stand-in (reference parity: the onnx session path)."""
    calls = {}

    fake = types.ModuleType("rembg")
    fake.new_session = lambda: "SESSION"

    def fake_remove(image, session=None, bgcolor=None):
        calls["session"] = session
        calls["bgcolor"] = bgcolor
        return image.convert("RGBA")

    fake.remove = fake_remove
    monkeypatch.setitem(sys.modules, "rembg", fake)
    br = BackgroundRemover()
    img = Image.fromarray(np.full((16, 16, 3), 128, np.uint8))
    out = br(img)
    assert calls["session"] == "SESSION"
    assert calls["bgcolor"] == [255, 255, 255, 0]
    assert out.mode == "RGBA"
