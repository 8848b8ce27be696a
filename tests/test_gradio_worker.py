"""GradioWorker behavior without the gradio dependency: image / multiview /
text inputs, export options, HTML viewer, stats (parity: reference
gradio_app.py worker paths :135-304, :599, :103)."""

import argparse
import os

import numpy as np
import pytest
from PIL import Image

import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "apps"))

from gradio_app import EXPORT_TYPES, GradioWorker  # noqa: E402


def _args(**kw):
    base = dict(model_path="", subfolder="", texgen_model_path="",
                enable_t23d=False, disable_tex=True, enable_flashvdm=False,
                compile=False, mc_algo="mc", low_vram_mode=False,
                random_weights=True)
    base.update(kw)
    return argparse.Namespace(**base)


def _img(color=(200, 90, 90)):
    arr = np.zeros((128, 128, 4), np.uint8)
    arr[32:96, 32:96] = list(color) + [255]
    return Image.fromarray(arr)


@pytest.fixture(scope="module")
def worker():
    return GradioWorker(_args())


def test_gen_shape_image_and_stats(worker, tmp_path_factory):
    mesh, ref = worker.gen_shape(image=_img(), steps=2, octree_resolution=32)
    assert mesh is not None and "stats" in mesh.metadata
    assert "shape_gen_total" in mesh.metadata["stats"]

    # export each supported file type, with face reduction
    for ftype in EXPORT_TYPES:
        path = worker.export(mesh, file_type=ftype, reduce_faces=2000)
        assert os.path.exists(path) and path.endswith(ftype)
        os.unlink(path)
    with pytest.raises(ValueError):
        worker.export(mesh, file_type="fbx")


def test_gen_shape_multiview(worker):
    views = {"front": _img((200, 60, 60)), "left": _img((60, 200, 60)),
             "back": _img((60, 60, 200))}
    mesh, ref = worker.gen_shape(mv_images=views, steps=2, octree_resolution=32)
    assert mesh is not None
    assert ref is not None and ref.size == views["front"].size


def test_html_viewer(worker):
    mesh, _ = worker.gen_shape(image=_img(), steps=2, octree_resolution=32)
    glb = worker.export(mesh, "glb")
    html = worker.html_viewer(glb)
    assert html.endswith(".html")
    content = open(html).read()
    assert "model-viewer" in content and os.path.basename(glb) in content
    os.unlink(glb)
    os.unlink(html)


def test_text_path_with_stub_backend():
    w = GradioWorker(_args())
    # wire a stub t2i backend (the real one needs diffusers or HY3D_T2I_CMD)
    from hunyuan3d2_tpu.utils.text2image import HunyuanDiTPipeline

    w.t2i = HunyuanDiTPipeline(backend=lambda p, negative_prompt, seed: _img())
    mesh, ref = w.gen_shape(prompt="a cute cat", steps=2, octree_resolution=32)
    assert mesh is not None


def test_t2i_raises_without_backend(monkeypatch):
    from hunyuan3d2_tpu.utils import text2image

    monkeypatch.delenv("HY3D_T2I_CMD", raising=False)
    monkeypatch.delenv("HY3D_RANDOM_WEIGHTS", raising=False)
    monkeypatch.setattr(text2image, "_diffusers_backend",
                        lambda *a: (_ for _ in ()).throw(ImportError()))
    with pytest.raises(RuntimeError):
        text2image.HunyuanDiTPipeline()


def test_t2i_command_backend(tmp_path, monkeypatch):
    """HY3D_T2I_CMD external-command backend round-trips an image."""
    from hunyuan3d2_tpu.utils import text2image

    script = tmp_path / "t2i.py"
    script.write_text(
        "import sys\nfrom PIL import Image\n"
        "Image.new('RGBA', (64, 64), (200, 90, 90, 255)).save(sys.argv[2])\n")
    monkeypatch.setenv("HY3D_T2I_CMD", f"{sys.executable} {script}")
    monkeypatch.setattr(text2image, "_diffusers_backend",
                        lambda *a: (_ for _ in ()).throw(ImportError()))
    pipe = text2image.HunyuanDiTPipeline()
    img = pipe("a red cube", seed=1)
    assert img.size == (64, 64)
