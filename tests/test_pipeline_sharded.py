"""Pipeline-level multi-chip execution: `pipeline.shard()` distributes the
whole stack over a (dp, tp) mesh and generation still produces the same
result as single-device (NEW TPU capability — the reference is single-GPU,
SURVEY.md §2.6).

Each case runs in a FRESH interpreter on a 4-device mesh: XLA:CPU executes
SPMD partitions on one thread per device, and this image has ONE physical
core — with 8 partition threads scheduled sequentially, a partition segment
of a few seconds puts the last thread past the hard-coded 40 s collective
rendezvous window and the runtime SIGABRTs ("Expected 8 threads to join the
rendezvous, but only N arrived"). 4 devices + small configs keep every
partition comfortably inside the window; real multi-core/multi-chip hosts
don't hit this.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SHAPE_CASE = """
import numpy as np, jax
from PIL import Image
from hunyuan3d2_tpu.parallel import make_mesh
from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

arr = np.zeros((128, 128, 4), np.uint8)
arr[32:96, 32:96] = [200, 90, 90, 255]
img = Image.fromarray(arr)

pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
    jax.random.PRNGKey(0), size="tiny", dino="tiny")
ref_lat = np.asarray(pipe(image=img, num_inference_steps=2,
                          output_type="latents", seed=3))

pipe.shard(make_mesh(4))
assert dict(pipe.mesh.shape) == {"dp": 2, "tp": 2}
leaf = jax.tree.leaves(pipe.model_params)[0]
assert len(leaf.sharding.mesh.devices.reshape(-1)) == 4

lat = np.asarray(pipe(image=img, num_inference_steps=2,
                      output_type="latents", seed=3))
np.testing.assert_allclose(lat, ref_lat, atol=5e-2, rtol=5e-2)

out = pipe(image=img, num_inference_steps=2, octree_resolution=16, seed=3)[0]
assert out is None or len(out.vertices) >= 0
print("SHARDED_SHAPE_OK")
"""

_PAINT_CASE = """
import numpy as np, jax
from PIL import Image
from hunyuan3d2_tpu.parallel import make_mesh
from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline
from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor
from hunyuan3d2_tpu.geometry.mesh import Mesh

lin = np.linspace(-1.01, 1.01, 33, dtype=np.float32)
g = (0.6 - np.sqrt(lin.reshape(-1, 1, 1) ** 2 + lin.reshape(1, -1, 1) ** 2
                   + lin.reshape(1, 1, -1) ** 2))[None].astype(np.float32)
base = SurfaceNetsExtractor()(g, mc_level=0.0)[0]
mesh = Mesh(base.mesh_v, base.mesh_f)

arr = np.zeros((128, 128, 4), np.uint8)
arr[32:96, 32:96] = [200, 90, 90, 255]
img = Image.fromarray(arr)

paint = Hunyuan3DPaintPipeline.init_random(
    view_size=32, render_size=64, texture_size=64, num_inference_steps=2)
paint.shard(make_mesh(4))
textured = paint(mesh, img)
assert textured is not None and textured.texture is not None
assert np.isfinite(textured.vertices).all()
print("SHARDED_PAINT_OK")
"""


def _run_case(code: str, token: str):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    assert token in r.stdout


@pytest.mark.filterwarnings("ignore")
def test_sharded_shape_pipeline_matches_single_device():
    _run_case(_SHAPE_CASE, "SHARDED_SHAPE_OK")


@pytest.mark.filterwarnings("ignore")
def test_sharded_paint_pipeline_runs():
    _run_case(_PAINT_CASE, "SHARDED_PAINT_OK")
