"""JAX-native HunyuanDiT text→image pipeline (pipelines/t2i.py).

Covers the reference t23d front-end contract (hy3dgen/text2image.py:30-81):
model forward shapes, the PAG perturbed branch, DDPM v-prediction stepping,
the diffusers weight-map round trip, directory from_pretrained, and the
utils.text2image backend resolution."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuan3d2_tpu.models import hunyuan_dit, sd_vae
from hunyuan3d2_tpu.pipelines.t2i import (
    DDPMConfig,
    HunyuanDiTJAXPipeline,
    ddpm_alphas_cumprod,
    ddpm_step,
    ddpm_timesteps,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = hunyuan_dit.TINY
    params = hunyuan_dit.init(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _inputs(cfg, b=2, res=16, key=1):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    x = jax.random.normal(ks[0], (b, res, res, cfg.in_channels))
    t = jnp.full((b,), 500.0)
    clip = jax.random.normal(ks[1], (b, cfg.text_len, cfg.text_dim))
    t5 = jax.random.normal(ks[2], (b, cfg.t5_len, cfg.t5_dim))
    cm = jnp.ones((b, cfg.text_len))
    tm = jnp.ones((b, cfg.t5_len))
    return x, t, clip, cm, t5, tm


def test_forward_shapes(tiny):
    cfg, params = tiny
    x, t, clip, cm, t5, tm = _inputs(cfg)
    ctx, pooled = hunyuan_dit.build_context(params, cfg, clip, cm, t5, tm)
    assert ctx.shape == (2, cfg.text_len + cfg.t5_len, cfg.text_dim)
    assert pooled.shape == (2, cfg.pooled_dim)
    out = hunyuan_dit.apply(params, cfg, x, t, ctx, pooled)
    assert out.shape == (2, 16, 16, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_text_padding_rows_replace_masked(tiny):
    """Masked text positions must read the learned padding rows, so changing
    a masked token's content cannot change the context."""
    cfg, params = tiny
    _, _, clip, cm, t5, tm = _inputs(cfg)
    cm = cm.at[:, -3:].set(0.0)
    ctx1, _ = hunyuan_dit.build_context(params, cfg, clip, cm, t5, tm)
    clip2 = clip.at[:, -1].add(100.0)
    ctx2, _ = hunyuan_dit.build_context(params, cfg, clip2, cm, t5, tm)
    np.testing.assert_array_equal(np.asarray(ctx1), np.asarray(ctx2))


def test_pag_branch_differs_and_matches_elsewhere(tiny):
    """pag=True perturbs only the configured layers: the output changes, and
    a config with no pag layers gives the identical program."""
    cfg, params = tiny
    x, t, clip, cm, t5, tm = _inputs(cfg, b=1)
    ctx, pooled = hunyuan_dit.build_context(params, cfg, clip, cm, t5, tm)
    base = np.asarray(hunyuan_dit.apply(params, cfg, x, t, ctx, pooled))
    pag = np.asarray(hunyuan_dit.apply(params, cfg, x, t, ctx, pooled,
                                       pag=True))
    assert np.abs(base - pag).max() > 1e-6
    import dataclasses

    cfg_nopag = dataclasses.replace(cfg, pag_layers=())
    pag_off = np.asarray(hunyuan_dit.apply(params, cfg_nopag, x, t, ctx,
                                           pooled, pag=True))
    np.testing.assert_allclose(pag_off, base, atol=1e-5)


def test_ddpm_schedule_and_step():
    sched = DDPMConfig()
    acp = ddpm_alphas_cumprod(sched)
    assert acp.shape == (1000,) and acp[0] > acp[-1] > 0
    ts = ddpm_timesteps(sched, 25)
    assert ts.shape == (25,) and ts[0] > ts[-1] >= 0 and ts.max() < 1000
    # v-prediction identity: with pred == true v, one step from x_t lands on
    # the posterior mean of x0 (deterministic final step recovers x0)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    t = jnp.asarray(40)
    a = jnp.asarray(acp)
    xt = jnp.sqrt(a[t]) * x0 + jnp.sqrt(1 - a[t]) * eps
    v = jnp.sqrt(a[t]) * eps - jnp.sqrt(1 - a[t]) * x0
    # final step (t_prev < 0) returns the x0 estimate exactly
    out = ddpm_step(v, t, jnp.asarray(-1), xt, a,
                    jnp.zeros_like(x0), "v_prediction")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_pipeline_end_to_end_deterministic():
    pipe = HunyuanDiTJAXPipeline.init_random(resolution=32,
                                             num_inference_steps=2)
    a = np.asarray(pipe("a cat", seed=3))
    b = np.asarray(pipe("a cat", seed=3))
    c = np.asarray(pipe("a dog", seed=3))
    assert a.shape == (32, 32, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_weight_map_roundtrip(tiny):
    from hunyuan3d2_tpu.io.diffusers_maps import (
        export_hunyuan_dit,
        map_hunyuan_dit,
    )

    cfg, params = tiny
    sd = export_hunyuan_dit(params, cfg)
    back = map_hunyuan_dit(sd, cfg, dtype="fp32")
    x, t, clip, cm, t5, tm = _inputs(cfg, b=1)
    ctx, pooled = hunyuan_dit.build_context(params, cfg, clip, cm, t5, tm)
    a = np.asarray(hunyuan_dit.apply(params, cfg, x, t, ctx, pooled))
    b = np.asarray(hunyuan_dit.apply(back, cfg, x, t, ctx, pooled))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_from_pretrained_directory(tmp_path, tiny):
    from safetensors.numpy import save_file

    from hunyuan3d2_tpu.io.diffusers_maps import (
        export_hunyuan_dit,
        export_sd_vae,
    )

    cfg, params = tiny
    troot = tmp_path / "transformer"
    vroot = tmp_path / "vae"
    troot.mkdir()
    vroot.mkdir()
    sd = {k: np.ascontiguousarray(np.asarray(v, np.float32))
          for k, v in export_hunyuan_dit(params, cfg).items()}
    save_file(sd, str(troot / "diffusion_pytorch_model.safetensors"))
    json.dump({
        "attention_head_dim": cfg.head_dim,
        "num_attention_heads": cfg.num_heads,
        "num_layers": cfg.depth, "in_channels": cfg.in_channels,
        "mlp_ratio": cfg.mlp_ratio, "cross_attention_dim": cfg.text_dim,
        "cross_attention_dim_t5": cfg.t5_dim,
        "text_len": cfg.text_len, "text_len_t5": cfg.t5_len,
    }, open(troot / "config.json", "w"))
    vcfg = sd_vae.TINY
    vparams = sd_vae.init(jax.random.PRNGKey(5), vcfg)
    vsd = {k: np.ascontiguousarray(np.asarray(v, np.float32))
           for k, v in export_sd_vae(vparams).items()}
    save_file(vsd, str(vroot / "diffusion_pytorch_model.safetensors"))
    json.dump({"latent_channels": 4,
               "block_out_channels": list(vcfg.block_out_channels),
               "layers_per_block": vcfg.layers_per_block,
               "scaling_factor": vcfg.scaling_factor},
              open(vroot / "config.json", "w"))

    pipe = HunyuanDiTJAXPipeline.from_pretrained(
        str(tmp_path), dtype="fp32", resolution=32, num_inference_steps=2)
    assert pipe.dit_cfg.hidden_size == cfg.hidden_size
    assert pipe.dit_cfg.depth == cfg.depth
    img = pipe("a boat", seed=1)
    assert np.asarray(img).shape == (32, 32, 3)


def test_text2image_jax_backend(monkeypatch):
    from hunyuan3d2_tpu.utils.text2image import HunyuanDiTPipeline

    monkeypatch.setenv("HY3D_RANDOM_WEIGHTS", "1")
    t2i = HunyuanDiTPipeline(model_path="/nonexistent")
    img = t2i("一只猫", seed=0)
    arr = np.asarray(img)
    assert arr.shape[2] in (3, 4) and arr.shape[0] == 64


def test_v11_no_style_meta_config():
    """v1.1/v1.2 checkpoints drop style + image-meta conditioning
    (use_style_cond_and_image_meta_size=False): extra conditioning is the
    pooled text alone, and the weight map round-trips without style keys."""
    import dataclasses

    from hunyuan3d2_tpu.io.diffusers_maps import (
        export_hunyuan_dit,
        map_hunyuan_dit,
    )

    cfg = dataclasses.replace(hunyuan_dit.TINY, use_style_meta=False)
    params = hunyuan_dit.init(jax.random.PRNGKey(2), cfg)
    assert "style_embedder" not in params
    pooled_in = params["extra_embedder"]["in_layer"]["w"].shape[0]
    assert pooled_in == cfg.pooled_dim
    x, t, clip, cm, t5, tm = _inputs(cfg, b=1)
    ctx, pooled = hunyuan_dit.build_context(params, cfg, clip, cm, t5, tm)
    out = hunyuan_dit.apply(params, cfg, x, t, ctx, pooled)
    assert out.shape == (1, 16, 16, cfg.out_channels)
    sd = export_hunyuan_dit(params, cfg)
    assert "time_extra_emb.style_embedder.weight" not in sd
    back = map_hunyuan_dit(sd, cfg, dtype="fp32")
    b2 = np.asarray(hunyuan_dit.apply(back, cfg, x, t, ctx, pooled))
    np.testing.assert_allclose(np.asarray(out), b2, atol=2e-6)


def test_pag_disable_skips_perturbed_branch():
    """pag_scale=None compiles without the PAG forward and still runs."""
    pipe = HunyuanDiTJAXPipeline.init_random(resolution=32,
                                             num_inference_steps=2)
    pipe.pag_scale = None
    img = pipe("x", seed=1)
    assert np.asarray(img).shape == (32, 32, 3)
