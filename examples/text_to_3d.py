"""Text → image → shape (t23d): the reference's text front-end flow
(hy3dgen/text2image.py HunyuanDiTPipeline feeding the shape pipeline, as
wired in the reference api_server.py:192-194 / gradio_app.py t23d tab).

HY3D_RANDOM_WEIGHTS=1 runs the whole path weight-free: the JAX-native
HunyuanDiT t2i pipeline (pipelines/t2i.py) at tiny config, then tiny shape
gen — a real GLB in seconds on CPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
from hunyuan3d2_tpu.utils.text2image import HunyuanDiTPipeline

RANDOM = os.environ.get("HY3D_RANDOM_WEIGHTS", "0") == "1"
prompt = sys.argv[1] if len(sys.argv) > 1 else "一只可爱的猫"

t2i = HunyuanDiTPipeline(
    model_path=os.environ.get(
        "HY3D_T2I_MODEL", "Tencent-Hunyuan/HunyuanDiT-v1.1-Diffusers-Distilled"))

if RANDOM:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    steps, octree = 5, 64
else:
    pipeline = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        "tencent/Hunyuan3D-2mini", subfolder="hunyuan3d-dit-v2-mini",
        variant="fp16")
    steps, octree = 50, 380

t0 = time.time()
image = t2i(prompt, seed=0)
print(f"t2i image: {image.size} in {time.time() - t0:.2f}s")

mesh = pipeline(image=image, num_inference_steps=steps,
                octree_resolution=octree, seed=12345)[0]
out = os.path.join(os.path.dirname(__file__), "..", "tmp", "results")
os.makedirs(out, exist_ok=True)
path = os.path.join(out, "text_to_3d.glb")
mesh.export(path)
print(f"--- {time.time() - t0:.2f} seconds ---")
print(f"wrote {path}")
