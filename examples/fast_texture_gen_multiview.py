"""Texture an EXISTING mesh with the paint-turbo pipeline (parity: reference
examples/fast_texture_gen_multiview.py — load a GLB, run HunyuanPaint-turbo)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

RANDOM = os.environ.get("HY3D_RANDOM_WEIGHTS", "0") == "1"

mesh_path = sys.argv[1] if len(sys.argv) > 1 else None
image_path = sys.argv[2] if len(sys.argv) > 2 else None

if RANDOM or mesh_path is None:
    import numpy as np

    from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor

    lin = np.linspace(-1.01, 1.01, 32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = (0.6 - np.sqrt(x * x + y * y + z * z))[None].astype(np.float32)
    out = SurfaceNetsExtractor()(g, mc_level=0.0)[0]
    mesh = Mesh(out.mesh_v, out.mesh_f)
    arr = np.zeros((64, 64, 4), np.uint8)
    arr[16:48, 16:48] = [60, 180, 220, 255]
    image = Image.fromarray(arr)
    pipe = Hunyuan3DPaintPipeline.init_random(
        view_size=64, render_size=256, texture_size=256)
    pipe.models["multiview_model"].num_inference_steps = 2
else:
    mesh = Mesh.load(mesh_path)
    image = Image.open(image_path)
    pipe = Hunyuan3DPaintPipeline.from_pretrained(
        "tencent/Hunyuan3D-2", subfolder="hunyuan3d-paint-v2-0-turbo")

start = time.time()
textured = pipe(mesh, image)
print("--- %s seconds ---" % (time.time() - start))
textured.export("fast_texture_gen.glb")
