"""Multiview shape + texture generation (parity: reference
examples/textured_shape_gen_multiview.py — Hunyuan3D-2mv shape from a
front/left/back view dict → paint conditioned on the front view)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from PIL import Image

from hunyuan3d2_tpu.models.conditioner import DinoImageEncoderMV, SingleImageEncoder
from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline
from hunyuan3d2_tpu.utils.imageproc import MVImageProcessorV2

RANDOM = os.environ.get("HY3D_RANDOM_WEIGHTS", "0") == "1"

if RANDOM:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    pipeline.conditioner = SingleImageEncoder(
        DinoImageEncoderMV(pipeline.conditioner.main.params,
                           pipeline.conditioner.main.cfg))
    pipeline.image_processor = MVImageProcessorV2()
    paint_pipe = Hunyuan3DPaintPipeline.init_random(
        view_size=64, render_size=256, texture_size=256)
    paint_pipe.models["multiview_model"].num_inference_steps = 2
    steps, octree = 3, 64
else:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        "tencent/Hunyuan3D-2mv", subfolder="hunyuan3d-dit-v2-mv",
        variant="fp16")
    pipeline.image_processor = MVImageProcessorV2()
    paint_pipe = Hunyuan3DPaintPipeline.from_pretrained("tencent/Hunyuan3D-2")
    steps, octree = 50, 380


def _demo(color):
    import numpy as np

    arr = np.zeros((512, 512, 4), np.uint8)
    arr[96:416, 96:416] = list(color) + [255]
    return Image.fromarray(arr)


if len(sys.argv) >= 4:
    views = {"front": Image.open(sys.argv[1]), "left": Image.open(sys.argv[2]),
             "back": Image.open(sys.argv[3])}
else:
    views = {"front": _demo((200, 60, 60)), "left": _demo((60, 200, 60)),
             "back": _demo((60, 60, 200))}

start = time.time()
mesh = pipeline(image=views, num_inference_steps=steps,
                octree_resolution=octree, num_chunks=20000, seed=12345)[0]
print("--- %s seconds ---" % (time.time() - start))
mesh.export("demo_white_mesh_mv.glb")

textured = paint_pipe(mesh, views["front"])
textured.export("demo_textured_mv.glb")
