"""Mini shape + texture generation (parity: reference
examples/textured_shape_gen_mini.py — Hunyuan3D-2mini shape → paint →
textured GLB)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from PIL import Image

from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

RANDOM = os.environ.get("HY3D_RANDOM_WEIGHTS", "0") == "1"

if RANDOM:
    shape_pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    paint_pipe = Hunyuan3DPaintPipeline.init_random(
        view_size=64, render_size=256, texture_size=256)
    paint_pipe.models["multiview_model"].num_inference_steps = 2
    steps, octree = 3, 64
else:
    shape_pipe = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        "tencent/Hunyuan3D-2mini", subfolder="hunyuan3d-dit-v2-mini",
        variant="fp16")
    paint_pipe = Hunyuan3DPaintPipeline.from_pretrained("tencent/Hunyuan3D-2")
    steps, octree = 50, 380

image_path = sys.argv[1] if len(sys.argv) > 1 else None
if image_path:
    image = Image.open(image_path)
else:
    import numpy as np

    arr = np.zeros((512, 512, 4), np.uint8)
    arr[96:416, 96:416] = [220, 120, 60, 255]
    image = Image.fromarray(arr)

start = time.time()
mesh = shape_pipe(image=image, num_inference_steps=steps,
                  octree_resolution=octree, num_chunks=20000, seed=12345)[0]
print("--- %s seconds ---" % (time.time() - start))
mesh.export("demo_mini.glb")

textured = paint_pipe(mesh, image)
textured.export("demo_textured_mini.glb")
