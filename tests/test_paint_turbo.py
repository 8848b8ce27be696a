"""Paint turbo (LCM) path smoke test."""

import numpy as np
from PIL import Image

import jax

from hunyuan3d2_tpu.pipelines.hunyuanpaint import HunyuanPaintPipeline


def test_turbo_lcm_path():
    pipe = HunyuanPaintPipeline.init_random(jax.random.PRNGKey(0), size="tiny",
                                            view_size=32)
    pipe.set_turbo(True)
    img = Image.fromarray(np.full((32, 32, 3), 128, np.uint8))
    ctrl = [Image.fromarray(np.full((32, 32, 3), 200, np.uint8)) for _ in range(4)]
    out = pipe([img], normal_imgs=[ctrl[:2]], position_imgs=[ctrl[2:]],
               camera_info_gen=[[12, 18]], camera_info_ref=[[0]],
               num_inference_steps=2, width=32, height=32)
    assert len(out.images) == 2
    assert out.images[0].size == (32, 32)
