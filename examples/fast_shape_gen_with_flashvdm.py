"""Turbo shape generation with FlashVDM-class decoding (parity: reference
examples/fast_shape_gen_with_flashvdm.py — 5 steps, octree 380, chunks
200000, FlashVDM on)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from PIL import Image

from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

RANDOM = os.environ.get("HY3D_RANDOM_WEIGHTS", "0") == "1"

if RANDOM:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    octree = 64
else:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        "tencent/Hunyuan3D-2", subfolder="hunyuan3d-dit-v2-0-turbo")
    octree = 380
pipeline.enable_flashvdm(True, mc_algo="dmc")

image_path = sys.argv[1] if len(sys.argv) > 1 else None
if image_path:
    image = Image.open(image_path)
else:
    import numpy as np

    arr = np.zeros((512, 512, 4), np.uint8)
    arr[96:416, 96:416] = [90, 200, 120, 255]
    image = Image.fromarray(arr)

start = time.time()
mesh = pipeline(image=image, num_inference_steps=5, octree_resolution=octree,
                num_chunks=200000, seed=12345)[0]
print("--- %s seconds ---" % (time.time() - start))
mesh.export("fast_shape_gen.glb")
