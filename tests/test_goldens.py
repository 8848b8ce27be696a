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


# ---------------------------------------------------------------------------
# production-config forward goldens (VERDICT r3 weak #6): the always-on
# golden above covers only the tiny CI config; these replay frozen
# random-weight forwards at the mini/full/guided DiT, mini/full ShapeVAE,
# and full 2.5D paint-UNet configs so a config-dependent numerics regression
# (the round-2 max_period class — wrong only at real widths/depths or with
# optional embeddings on) cannot pass the suite. Recorded by
# scripts/record_config_goldens.py; shares that script's compute recipe.
# ---------------------------------------------------------------------------
def _config_golden_file():
    with open(os.path.join(GOLDENS_DIR, "config_forwards.json")) as fh:
        return json.load(fh)


def _replay_dit(name):
    import dataclasses

    import jax.numpy as jnp

    from hunyuan3d2_tpu.models import dit
    from hunyuan3d2_tpu.utils.debug import tensor_stats

    cfg = {"dit_mini": dit.MINI, "dit_full": dit.FULL,
           "dit_mini_guided": dataclasses.replace(dit.MINI, guidance_embed=True),
           }[name]
    params = dit.init(jax.random.PRNGKey(1), cfg)
    kx, kc = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 64, cfg.in_channels), jnp.float32)
    cond = jax.random.normal(kc, (1, 16, cfg.context_in_dim), jnp.float32)
    guidance = jnp.array([5.0], jnp.float32) if cfg.guidance_embed else None
    out = dit.apply(params, cfg, x, jnp.array([0.5], jnp.float32), cond,
                    guidance=guidance)
    return tensor_stats(out)


def _replay_vae(name):
    import jax.numpy as jnp

    from hunyuan3d2_tpu.models import shapevae as sv
    from hunyuan3d2_tpu.utils.debug import tensor_stats

    cfg = {"vae_mini": sv.MINI, "vae_full": sv.FULL}[name]
    params = sv.init(jax.random.PRNGKey(3), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 128, cfg.embed_dim),
                            jnp.float32)
    hidden = sv.decode_latents(params, cfg, lat)
    kv = sv.compute_kv(params, cfg, hidden)
    q = jax.random.uniform(jax.random.PRNGKey(5), (1, 256, 3), jnp.float32,
                           -1.0, 1.0)
    logits = sv.decode_queries(params, cfg, q, kv)
    return tensor_stats(hidden), tensor_stats(logits)


@pytest.mark.parametrize("name", ["dit_mini", "dit_mini_guided"])
def test_config_goldens_dit_small(name):
    want = _config_golden_file()
    _assert_close({name: _replay_dit(name)}, {name: want[name]})


@pytest.mark.slow
def test_config_goldens_dit_full():
    want = _config_golden_file()
    _assert_close({"dit_full": _replay_dit("dit_full")},
                  {"dit_full": want["dit_full"]})


def test_config_goldens_vae():
    want = _config_golden_file()
    hidden, logits = _replay_vae("vae_mini")
    _assert_close({"vae_mini_hidden": hidden, "vae_mini_logits": logits},
                  {k: want[k] for k in ("vae_mini_hidden", "vae_mini_logits")})


@pytest.mark.slow
def test_config_goldens_paint_unet_full():
    import jax.numpy as jnp

    from hunyuan3d2_tpu.models import paint_unet
    from hunyuan3d2_tpu.utils.debug import tensor_stats

    want = _config_golden_file()["paint_unet_default"]
    cfg = paint_unet.DEFAULT
    params = paint_unet.init(jax.random.PRNGKey(6), cfg)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    sample = jax.random.normal(ks[0], (1, 2, 32, 32, 4), jnp.float32)
    normal = jax.random.normal(ks[1], (1, 2, 32, 32, 4), jnp.float32)
    position = jax.random.normal(ks[2], (1, 2, 32, 32, 4), jnp.float32)
    ref = jax.random.normal(ks[3], (1, 1, 32, 32, 4), jnp.float32)
    noise_pred, _ = paint_unet.apply(
        params, cfg, sample, jnp.float32(500.0), normal, position, ref,
        jnp.array([[5, 6]], jnp.int32), jnp.array([[0]], jnp.int32))
    _assert_close({"paint_unet_default": tensor_stats(noise_pred)},
                  {"paint_unet_default": want})
