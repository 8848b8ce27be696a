"""Batched (multi-image) shape generation."""

import numpy as np
from PIL import Image

import jax

from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
import pytest

pytestmark = pytest.mark.slow


def _img(c):
    a = np.zeros((48, 48, 4), np.uint8)
    a[12:36, 12:36] = list(c) + [255]
    return Image.fromarray(a)


def test_batch_of_images_produces_batch_of_meshes():
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    pipe.enable_flashvdm(True, mc_algo="dmc")  # per-mesh decoder, batched input
    meshes = pipe(image=[_img((200, 60, 60)), _img((60, 60, 200))],
                  num_inference_steps=2, octree_resolution=32, seed=5)
    assert len(meshes) == 2
    for m in meshes:
        assert m is None or len(m.vertices) >= 0
