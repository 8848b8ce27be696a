"""Multiview-conditioned shape generation (parity: reference
examples/mv_shape_gen.py — front/left/back view dict → Hunyuan3D-2mv)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from PIL import Image

from hunyuan3d2_tpu.models.conditioner import DinoImageEncoderMV, SingleImageEncoder
from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
from hunyuan3d2_tpu.utils.imageproc import MVImageProcessorV2

RANDOM = os.environ.get("HY3D_RANDOM_WEIGHTS", "0") == "1"

if RANDOM:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    # swap to MV conditioner + processor
    pipeline.conditioner = SingleImageEncoder(
        DinoImageEncoderMV(pipeline.conditioner.main.params,
                           pipeline.conditioner.main.cfg))
    pipeline.image_processor = MVImageProcessorV2()
    steps, octree = 5, 64
else:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        "tencent/Hunyuan3D-2mv", subfolder="hunyuan3d-dit-v2-mv")
    pipeline.image_processor = MVImageProcessorV2()
    steps, octree = 30, 256


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
                octree_resolution=octree, seed=12345)[0]
print("--- %s seconds ---" % (time.time() - start))
mesh.export("shape_gen_mv.glb")
