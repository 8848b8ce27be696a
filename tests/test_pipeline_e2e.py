"""End-to-end shape generation smoke test: random-weight mini pipeline,
PIL image in → watertight mesh out → GLB on disk. This is the rebuild's
version of the reference's example-script integration tests (SURVEY.md §4.1)
scaled down to CI (CPU, tiny octree, 3 steps)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import jax

from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline


@pytest.fixture(scope="module")
def pipeline():
    return Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")


def _test_image():
    rs = np.random.RandomState(0)
    img = np.zeros((64, 64, 4), np.uint8)
    img[16:48, 16:48, :3] = rs.randint(0, 255, (32, 32, 3))
    img[16:48, 16:48, 3] = 255
    return Image.fromarray(img)


def test_shape_generation_end_to_end(pipeline, tmp_path):
    mesh = pipeline(
        image=_test_image(), num_inference_steps=3, guidance_scale=5.0,
        octree_resolution=32, num_chunks=30000, seed=12345,
    )[0]
    assert mesh is not None
    assert len(mesh.vertices) > 0 and len(mesh.faces) > 0
    # vertices inside the [-1.01, 1.01] box
    assert np.abs(mesh.vertices).max() <= 1.01 + 1e-5
    out = str(tmp_path / "out.glb")
    mesh.export(out)
    import os

    assert os.path.getsize(out) > 1000


def test_shape_generation_latents_output(pipeline):
    latents = pipeline(
        image=_test_image(), num_inference_steps=2, guidance_scale=5.0,
        output_type="latents", seed=1,
    )
    assert latents.shape == (1, pipeline.vae.cfg.num_latents, 64)
    arr = np.asarray(latents)
    assert np.isfinite(arr).all()


def test_seed_determinism(pipeline):
    a = pipeline(image=_test_image(), num_inference_steps=2,
                 output_type="latents", seed=7)
    b = pipeline(image=_test_image(), num_inference_steps=2,
                 output_type="latents", seed=7)
    c = pipeline(image=_test_image(), num_inference_steps=2,
                 output_type="latents", seed=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_hierarchical_and_flashvdm_paths(pipeline):
    mesh = pipeline.enable_flashvdm(True, mc_algo="dmc")(
        image=_test_image(), num_inference_steps=2,
        octree_resolution=32, seed=3,
    )[0]
    # random weights may or may not produce a surface; the path must not crash
    assert mesh is None or len(mesh.vertices) >= 0
    pipeline.enable_flashvdm(False)
