"""Standard shape generation (parity: reference examples/shape_gen.py —
50 steps, octree 380, chunks 20000, fixed seed)."""

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
    steps, octree = 5, 64
else:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        "tencent/Hunyuan3D-2", subfolder="hunyuan3d-dit-v2-0")
    steps, octree = 50, 380

image_path = sys.argv[1] if len(sys.argv) > 1 else None
if image_path:
    image = Image.open(image_path)
else:
    import numpy as np

    arr = np.zeros((512, 512, 4), np.uint8)
    arr[96:416, 96:416] = [90, 120, 220, 255]
    image = Image.fromarray(arr)

start = time.time()
mesh = pipeline(image=image, num_inference_steps=steps,
                octree_resolution=octree, num_chunks=20000, seed=12345)[0]
print("--- %s seconds ---" % (time.time() - start))
mesh.export("shape_gen.glb")
