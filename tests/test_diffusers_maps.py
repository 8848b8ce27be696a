"""Round-trip tests of the diffusers-format mapping: our init tree →
diffusers state-dict naming → back through the production mapper must be
identical (validates every key name, shape, and transpose in both paths)."""

import jax
import numpy as np

from hunyuan3d2_tpu.io import diffusers_maps as dm
from hunyuan3d2_tpu.models import paint_unet, sd_vae


def _trees_equal(a, b, path=""):
    assert type(a) is type(b) or isinstance(a, (dict, list)) == isinstance(b, (dict, list)), path
    if isinstance(a, dict):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            _trees_equal(a[k], b[k], f"{path}/{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _trees_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-6, err_msg=path)


def test_paint_unet_roundtrip():
    cfg = paint_unet.TINY
    params = paint_unet.init(jax.random.PRNGKey(0), cfg)
    sd = dm.export_paint_unet(params)
    # every key must look like a torch state-dict entry
    assert all(k.startswith(("unet.", "unet_dual.")) for k in sd)
    assert "unet.learned_text_clip_gen" in sd
    back = dm.map_paint_unet(sd, cfg, dtype=np.float32)
    _trees_equal(params, back)


def test_sd_vae_roundtrip():
    cfg = sd_vae.TINY
    params = sd_vae.init(jax.random.PRNGKey(1), cfg)
    sd = dm.export_sd_vae(params)
    assert "encoder.mid_block.attentions.0.to_q.weight" in sd
    back = dm.map_sd_vae(sd, cfg, dtype=np.float32)
    _trees_equal(params, back)


def test_dual_branch_has_no_extras():
    cfg = paint_unet.TINY
    params = paint_unet.init(jax.random.PRNGKey(2), cfg)
    sd = dm.export_paint_unet(params)
    assert not any("unet_dual" in k and "attn_refview" in k for k in sd)
    assert not any("unet_dual" in k and "class_embedding" in k for k in sd)
    # dual keeps the wrapped-transformer naming absent (plain block)
    assert any(k.startswith("unet_dual.down_blocks.0.attentions.0."
                            "transformer_blocks.0.norm1") for k in sd)
    assert any(k.startswith("unet.down_blocks.0.attentions.0."
                            "transformer_blocks.0.transformer.norm1") for k in sd)
