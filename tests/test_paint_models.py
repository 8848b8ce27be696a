"""SD VAE + 2.5D paint UNet structural tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuan3d2_tpu.models import paint_unet, sd_vae


def test_sd_vae_roundtrip_shapes():
    cfg = sd_vae.TINY
    params = sd_vae.init(jax.random.PRNGKey(0), cfg)
    img = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
    lat = sd_vae.encode(params, cfg, img)
    # 2 blocks → one downsample → 16x16
    assert lat.shape == (2, 16, 16, 4)
    out = sd_vae.decode(params, cfg, lat)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sd_vae_default_downsampling_factor():
    cfg = sd_vae.DEFAULT
    # don't init the full 80M-param VAE; just check the math of the config
    assert len(cfg.block_out_channels) == 4  # 3 downsamples → /8


def test_paint_unet_forward_shapes_and_cache():
    cfg = paint_unet.TINY
    params = paint_unet.init(jax.random.PRNGKey(0), cfg)
    b, n_gen, n_ref, h = 1, 3, 1, 16
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.randn(b, n_gen, h, h, 4), jnp.float32)
    normal = jnp.asarray(rs.randn(b, n_gen, h, h, 4), jnp.float32)
    position = jnp.asarray(rs.randn(b, n_gen, h, h, 4), jnp.float32)
    ref = jnp.asarray(rs.randn(b, n_ref, h, h, 4), jnp.float32)
    cam_gen = jnp.zeros((b, n_gen), jnp.int32)
    cam_ref = jnp.zeros((b, n_ref), jnp.int32)

    out, cache = paint_unet.apply(params, cfg, sample, jnp.float32(500.0),
                                  normal, position, ref, cam_gen, cam_ref)
    assert out.shape == (b, n_gen, h, h, 4)
    assert np.isfinite(np.asarray(out)).all()
    # cache holds one entry per cross-attn transformer layer
    assert len(cache) > 0
    # reusing the cache skips the ref pass and gives identical output
    out2, _ = paint_unet.apply(params, cfg, sample, jnp.float32(500.0),
                               normal, position, ref, cam_gen, cam_ref,
                               cache=cache)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-5)


def test_paint_unet_ref_image_changes_output():
    """Reference attention must actually inject the ref image."""
    cfg = paint_unet.TINY
    params = paint_unet.init(jax.random.PRNGKey(1), cfg)
    rs = np.random.RandomState(1)
    b, n, h = 1, 2, 16
    args = [jnp.asarray(rs.randn(b, n, h, h, 4), jnp.float32) for _ in range(3)]
    cam_gen = jnp.zeros((b, n), jnp.int32)
    cam_ref = jnp.zeros((b, 1), jnp.int32)
    ref1 = jnp.asarray(rs.randn(b, 1, h, h, 4), jnp.float32)
    ref2 = ref1 + 1.0
    o1, _ = paint_unet.apply(params, cfg, args[0], jnp.float32(100.0),
                             args[1], args[2], ref1, cam_gen, cam_ref)
    o2, _ = paint_unet.apply(params, cfg, args[0], jnp.float32(100.0),
                             args[1], args[2], ref2, cam_gen, cam_ref)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_paint_unet_multiview_coupling():
    """Changing view 0's latent must affect view 1's prediction through the
    multiview attention (tokens of all views attend to each other)."""
    cfg = paint_unet.TINY
    params = paint_unet.init(jax.random.PRNGKey(2), cfg)
    rs = np.random.RandomState(2)
    b, n, h = 1, 2, 16
    sample = rs.randn(b, n, h, h, 4).astype(np.float32)
    normal = jnp.asarray(rs.randn(b, n, h, h, 4), jnp.float32)
    position = jnp.asarray(rs.randn(b, n, h, h, 4), jnp.float32)
    ref = jnp.asarray(rs.randn(b, 1, h, h, 4), jnp.float32)
    cam_gen = jnp.zeros((b, n), jnp.int32)
    cam_ref = jnp.zeros((b, 1), jnp.int32)
    o1, _ = paint_unet.apply(params, cfg, jnp.asarray(sample), jnp.float32(10.0),
                             normal, position, ref, cam_gen, cam_ref)
    sample2 = sample.copy()
    sample2[0, 0] += 1.0
    o2, _ = paint_unet.apply(params, cfg, jnp.asarray(sample2), jnp.float32(10.0),
                             normal, position, ref, cam_gen, cam_ref)
    # view 1 changed even though only view 0's input changed
    assert not np.allclose(np.asarray(o1)[0, 1], np.asarray(o2)[0, 1], atol=1e-6)
