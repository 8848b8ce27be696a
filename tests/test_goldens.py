"""Golden per-stage tensor statistics (the reference's QA mechanism,
SURVEY.md §4.2: size/min/max/mean of every intermediate frozen as golden
values, e.g. project/image3d/dit.py:439-487 comments).

Two modes:
  * Always-on regression golden: a frozen random-weight run
    (tests/goldens/random_tiny_seed0.json, recorded with the same recipe as
    scripts/record_goldens.py) — any unintended numerics change in the shape
    stack shows up here even without checkpoints.
  * Opt-in real-checkpoint golden: set HY3DGEN_MODELS to a directory holding
    real checkpoints and record a goldens file first:
        python scripts/record_goldens.py --model_path tencent/Hunyuan3D-2mini \
            --subfolder hunyuan3d-dit-v2-mini --out tests/goldens/mini.json
    The test then re-runs the flow and asserts the stats still match; diff
    the file against the reference's frozen comment values by hand.
"""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

GOLDENS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _run_stage_stats(pipe, octree=32):
    from hunyuan3d2_tpu.models import shapevae as sv
    from hunyuan3d2_tpu.utils.debug import tensor_stats

    arr = np.zeros((512, 512, 4), np.uint8)
    arr[128:384, 128:384] = [180, 90, 60, 255]
    image = Image.fromarray(arr)
    g = {}
    ci = pipe.prepare_image(image)
    g["image"] = tensor_stats(ci["image"])
    cond = pipe.encode_cond(ci["image"], do_cfg=True)
    g["cond"] = tensor_stats(cond)
    lat = pipe(image=image, num_inference_steps=5, output_type="latents",
               seed=12345)
    g["latents"] = tensor_stats(lat)
    hidden = sv.decode_latents(pipe.vae.params, pipe.vae.cfg, lat)
    g["vae_hidden"] = tensor_stats(hidden)
    grid = pipe.vae.decode_grid(lat, octree_resolution=octree, to_host=True)
    g["grid_logits"] = tensor_stats(grid)
    return g


def _assert_close(got: dict, want: dict, rtol=2e-3, atol=2e-3):
    for stage, ref in want.items():
        cur = got[stage]
        assert cur["size"] == ref["size"], (stage, cur["size"], ref["size"])
        for field in ("min", "max", "mean"):
            a, b = cur[field], ref[field]
            assert abs(a - b) <= atol + rtol * max(abs(a), abs(b)), \
                (stage, field, a, b)


def test_random_weight_goldens_frozen():
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

    with open(os.path.join(GOLDENS_DIR, "random_tiny_seed0.json")) as fh:
        want = json.load(fh)
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    got = _run_stage_stats(pipe, octree=32)
    _assert_close(got, want)


@pytest.mark.skipif(
    not os.environ.get("HY3DGEN_MODELS")
    or not os.path.exists(os.path.join(GOLDENS_DIR, "mini.json")),
    reason="needs HY3DGEN_MODELS checkpoints + a recorded goldens file "
           "(see module docstring)")
def test_real_checkpoint_goldens():
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

    with open(os.path.join(GOLDENS_DIR, "mini.json")) as fh:
        want = json.load(fh)
    pipe = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        "tencent/Hunyuan3D-2mini", subfolder="hunyuan3d-dit-v2-mini")
    got = _run_stage_stats(pipe, octree=128)
    _assert_close(got, want)
