"""Multiview-conditioned shape generation e2e (tiny random stack)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

import jax

from hunyuan3d2_tpu.models.conditioner import DinoImageEncoderMV, SingleImageEncoder
from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
from hunyuan3d2_tpu.utils.imageproc import MVImageProcessorV2


def _img(color):
    arr = np.zeros((64, 64, 4), np.uint8)
    arr[16:48, 16:48] = list(color) + [255]
    return Image.fromarray(arr)


def test_mv_pipeline_end_to_end():
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    pipe.conditioner = SingleImageEncoder(
        DinoImageEncoderMV(pipe.conditioner.main.params, pipe.conditioner.main.cfg))
    pipe.image_processor = MVImageProcessorV2()

    views = {"front": _img((200, 60, 60)), "left": _img((60, 200, 60)),
             "back": _img((60, 60, 200))}
    latents = pipe(image=views, num_inference_steps=2, octree_resolution=32,
                   seed=1, output_type="latents")
    assert latents.shape[0] == 1
    assert np.isfinite(np.asarray(latents)).all()

    # view order front/left/back → view_idxs [0,1,2]
    out = pipe.image_processor(views)
    assert out["view_idxs"] == [[0, 1, 2]]
    assert out["image"].shape[1] == 3


def test_mv_view_embedding_changes_tokens():
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    enc = DinoImageEncoderMV(pipe.conditioner.main.params, pipe.conditioner.main.cfg)
    import jax.numpy as jnp

    px = jnp.zeros((1, 2, enc.cfg.image_size, enc.cfg.image_size, 3), jnp.bfloat16)
    t1 = enc.encode_views(px, [0, 1])
    t2 = enc.encode_views(px, [0, 2])
    assert not np.allclose(np.asarray(t1, np.float32),
                           np.asarray(t2, np.float32))
