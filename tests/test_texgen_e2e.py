"""End-to-end texture generation: mesh + image → textured mesh (tiny random
paint stack, small render/texture sizes, CPU)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import jax

from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.pipelines.texgen import (
    Hunyuan3DPaintPipeline,
    camera_info_index,
)
from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor


def _sphere_mesh(res=32, radius=0.6):
    lin = np.linspace(-1.01, 1.01, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = (radius - np.sqrt(x * x + y * y + z * z))[None].astype(np.float32)
    out = SurfaceNetsExtractor()(g, mc_level=0.0)[0]
    return Mesh(out.mesh_v, out.mesh_f)


def test_camera_info_formula():
    azims = [0, 90, 180, 270, 0, 180]
    elevs = [0, 0, 0, 0, 90, -90]
    infos = [camera_info_index(a, e) for a, e in zip(azims, elevs)]
    # reference formula values for the 6 candidate cameras
    assert infos == [(((a // 30) + 9) % 12) // {0: 1, 90: 3, -90: 3}[e]
                     + {0: 12, 90: 40, -90: 36}[e]
                     for a, e in zip(azims, elevs)]
    assert len(set(infos)) == len(infos)  # distinct camera ids


def test_texgen_end_to_end(tmp_path):
    pipe = Hunyuan3DPaintPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", view_size=64,
        render_size=96, texture_size=96)
    pipe.models["multiview_model"].num_inference_steps = 2

    img = np.zeros((64, 64, 4), np.uint8)
    img[16:48, 16:48, :3] = [200, 30, 30]
    img[16:48, 16:48, 3] = 255
    image = Image.fromarray(img)

    mesh = _sphere_mesh()
    out = pipe(mesh, image)

    assert out.texture is not None
    assert out.texture.shape[:2] == (96, 96)
    assert out.uv is not None and len(out.uv) == len(out.vertices)
    p = str(tmp_path / "textured.glb")
    out.export(p)
    import os

    assert os.path.getsize(p) > 2000
    # reload: texture survives the GLB round-trip
    back = Mesh.load(p)
    assert back.texture is not None


def test_texgen_device_path_on_cpu(tmp_path, monkeypatch):
    """The device-resident texture path (Pallas raster + gather bake +
    device cond maps) end-to-end through the interpreter on CPU —
    HY3D_DEVICE_BAKE=force overrides the TPU-backend gate."""
    monkeypatch.setenv("HY3D_DEVICE_BAKE", "force")
    pipe = Hunyuan3DPaintPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", view_size=64,
        render_size=96, texture_size=96)
    pipe.models["multiview_model"].num_inference_steps = 2

    img = np.zeros((64, 64, 4), np.uint8)
    img[16:48, 16:48, :3] = [200, 30, 30]
    img[16:48, 16:48, 3] = 255
    image = Image.fromarray(img)

    out = pipe(mesh=_sphere_mesh(), image=image)
    assert out.texture is not None
    assert out.texture.shape[:2] == (96, 96)
    # the bake painted a sane fraction of the atlas before inpainting
    from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS

    assert "Texture Baking (device)" in LAST_TIMINGS
