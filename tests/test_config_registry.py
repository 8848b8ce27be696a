"""Config registry: reference config.yaml target names must instantiate our
TPU-native classes (parity: instantiate_from_config, pipelines.py:113-128)."""

import pytest

from hunyuan3d2_tpu.config import get_obj_from_str, instantiate_from_config


def test_reference_targets_resolve():
    cls = get_obj_from_str("hy3dgen.shapegen.models.Hunyuan3DDiT")
    from hunyuan3d2_tpu.models.dit import Hunyuan3DDiT

    assert cls is Hunyuan3DDiT

    sched = instantiate_from_config({
        "target": "hy3dgen.shapegen.schedulers.FlowMatchEulerDiscreteScheduler",
        "params": {"num_train_timesteps": 1000},
    })
    assert sched.num_train_timesteps == 1000


def test_reference_model_config_builds_mini_dit():
    """The exact mini config block from the reference checkpoints."""
    model = instantiate_from_config({
        "target": "hy3dgen.shapegen.models.Hunyuan3DDiT",
        "params": {
            "in_channels": 64, "context_in_dim": 1536, "hidden_size": 1024,
            "mlp_ratio": 4.0, "num_heads": 16, "depth": 8,
            "depth_single_blocks": 16, "axes_dim": [64], "theta": 10000,
            "qkv_bias": True, "guidance_embed": False,
        },
    })
    assert model.cfg.depth == 8
    assert model.cfg.depth_single_blocks == 16
    assert model.guidance_embed is False


def test_vae_config_builds():
    vae = instantiate_from_config({
        "target": "hy3dgen.shapegen.models.ShapeVAE",
        "params": {"num_latents": 512, "embed_dim": 64, "num_freqs": 8,
                   "include_pi": False, "heads": 16, "width": 1024,
                   "num_decoder_layers": 16, "qkv_bias": False,
                   "qk_norm": True, "scale_factor": 1.0188137142395404},
    })
    assert vae.cfg.num_latents == 512
    assert abs(vae.cfg.scale_factor - 1.0188137142395404) < 1e-12


def test_missing_target_raises():
    with pytest.raises(KeyError):
        instantiate_from_config({"params": {}})
