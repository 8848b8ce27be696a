"""CLIP vision tower parity against HF transformers (random weights mapped
through the production mapper)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.models import clip_vit


def test_clip_parity_with_hf_transformers():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        projection_dim=32)
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = clip_vit.TINY
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    from hunyuan3d2_tpu.io.checkpoints import map_clip_vit

    params = map_clip_vit(sd, cfg, np.float32, prefix="vision_model.")

    rs = np.random.RandomState(0)
    img = rs.randn(2, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(img.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    ours = np.asarray(clip_vit.apply(params, cfg, jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


def test_dual_image_encoder():
    from hunyuan3d2_tpu.models.conditioner import (
        DinoImageEncoder,
        DinoEncoderConfig,
        DualImageEncoder,
    )
    from hunyuan3d2_tpu.models import dinov2

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    dcfg = DinoEncoderConfig(
        dino=dinov2.DinoConfig(hidden_size=48, num_layers=1, num_heads=4,
                               patch_size=14, image_size=56, swiglu_hidden=64),
        image_size=56)
    dual = DualImageEncoder(
        DinoImageEncoder.init_random(k1, dcfg),
        clip_vit.CLIPImageEncoder.init_random(k2, clip_vit.TINY))
    img = jnp.zeros((1, 56, 56, 3), jnp.float32)
    out = dual(img)
    assert set(out) == {"main", "additional"}
    assert out["main"].shape == (1, 17, 48)
    assert out["additional"].shape == (1, 17, 64)
