"""Utils coverage: image preprocessing, rembg fallback, timers, delight
recorrection, counters."""

import time

import numpy as np
from PIL import Image

from hunyuan3d2_tpu.utils.counters import RunningStats
from hunyuan3d2_tpu.utils.dehighlight import Light_Shadow_Remover, recorrect_rgb
from hunyuan3d2_tpu.utils.imageproc import (
    ImageProcessorV2,
    MVImageProcessorV2,
    dino_transform,
    recenter_rgba,
)
from hunyuan3d2_tpu.utils.imagesuper import Image_Super_Net
from hunyuan3d2_tpu.utils.rembg import BackgroundRemover
from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS, synchronize_timer, timed_scope


def _rgba(size=64, inset=16, color=(200, 50, 50)):
    img = np.zeros((size, size, 4), np.uint8)
    img[inset:size - inset, inset:size - inset, :3] = color
    img[inset:size - inset, inset:size - inset, 3] = 255
    return img


def test_recenter_scales_object_to_border_ratio():
    out = recenter_rgba(_rgba(), size=128, border_ratio=0.15)
    assert out.shape == (128, 128, 4)
    ys, xs = np.nonzero(out[..., 3] > 0)
    extent = max(ys.max() - ys.min(), xs.max() - xs.min()) + 1
    # reference preprocessors.py:66-67: object spans (1 − border_ratio)
    assert abs(extent - int(128 * 0.85)) <= 2


def test_image_processor_ranges():
    proc = ImageProcessorV2(size=64)
    out = proc(Image.fromarray(_rgba()))
    img, mask = out["image"], out["mask"]
    assert img.shape == (1, 64, 64, 3) and mask.shape == (1, 64, 64, 1)
    assert -1.0 <= img.min() and img.max() <= 1.0
    # background composited to white (+1)
    assert img[0, 0, 0].min() > 0.99
    assert set(np.unique(mask)).issubset({-1.0, 1.0})


def test_mv_processor_view_order():
    proc = MVImageProcessorV2(size=32)
    out = proc({"back": Image.fromarray(_rgba(32, 8)),
                "front": Image.fromarray(_rgba(32, 8))})
    # front(0) before back(2) regardless of dict order
    assert out["view_idxs"] == [[0, 2]]
    assert out["image"].shape == (1, 2, 32, 32, 3)


def test_dino_transform_stats():
    x = np.zeros((1, 64, 64, 3), np.float32)  # [-1,1] zero → 0.5 in [0,1]
    out = dino_transform(x, image_size=56)
    assert out.shape == (1, 56, 56, 3)
    np.testing.assert_allclose(out[0, 0, 0],
                               (0.5 - np.array([0.485, 0.456, 0.406]))
                               / np.array([0.229, 0.224, 0.225]), atol=1e-2)


def test_rembg_alpha_passthrough():
    img = Image.fromarray(_rgba())
    out = BackgroundRemover()(img)
    assert out.mode == "RGBA"
    np.testing.assert_array_equal(np.asarray(out)[..., 3],
                                  np.asarray(img)[..., 3])


def test_rembg_grabcut_on_opaque():
    rgb = np.full((64, 64, 3), 255, np.uint8)
    rgb[20:44, 20:44] = [200, 30, 30]
    out = np.asarray(BackgroundRemover()(Image.fromarray(rgb)))
    assert out.shape[-1] == 4
    # object kept, corners removed
    assert out[32, 32, 3] > 0
    assert out[2, 2, 3] == 0


def test_timer_records():
    with synchronize_timer("unit-test-stage"):
        time.sleep(0.01)
    assert LAST_TIMINGS["unit-test-stage"] >= 0.01
    with timed_scope("always-on"):
        pass
    assert "always-on" in LAST_TIMINGS


def test_recorrect_rgb_matches_moments():
    rs = np.random.RandomState(0)
    src = rs.rand(32, 32, 3).astype(np.float32) * 0.5
    tgt = rs.rand(32, 32, 3).astype(np.float32) * 0.5 + 0.5
    out = recorrect_rgb(src, tgt)
    c = slice(3, 29)
    np.testing.assert_allclose(out[c, c].mean((0, 1)), tgt[c, c].mean((0, 1)),
                               atol=0.05)


def test_delight_noop_composites_alpha():
    img = Image.fromarray(_rgba())
    out = Light_Shadow_Remover()(img)
    arr = np.asarray(out)
    assert arr[0, 0].tolist() == [255, 255, 255]  # background → white


def test_super_net_upscales():
    img = Image.fromarray(_rgba(32, 8))
    out = Image_Super_Net()(img)
    assert out.size == (128, 128)


def test_running_stats():
    rsst = RunningStats()
    for v in (1.0, 2.0, 3.0):
        rsst.append(v)
    assert rsst.count == 3 and rsst.mean == 2.0
    assert rsst.min == 1.0 and rsst.max == 3.0
