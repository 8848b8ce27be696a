"""Fused Pallas geo-decoder kernel vs the stock XLA decode path.

The kernel (ops/geo_decoder_pallas.py) must be numerically equivalent to
models/shapevae.decode_queries — same op order, bf16 MXU inputs, fp32
softmax/LayerNorm — at the production mini config (512 latents, width 1024,
16 heads). CPU runs use the Pallas interpreter (interpret=None auto-gate).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.models import shapevae as sv
from hunyuan3d2_tpu.ops.geo_decoder_pallas import fused_geo_decode

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mini_kv():
    cfg = sv.MINI
    params = jax.jit(sv.init, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.num_latents, cfg.embed_dim))
    hidden = sv.decode_latents(params, cfg, lat)
    kv = sv.compute_kv(params, cfg, hidden)
    kv16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), kv)
    return params, cfg, kv16


def test_fused_matches_decode_queries(mini_kv):
    params, cfg, kv16 = mini_kv
    pts = jax.random.uniform(jax.random.PRNGKey(2), (1, 640, 3),
                             minval=-1.0, maxval=1.0)
    ref = np.asarray(sv.decode_queries(params, cfg, pts, kv16), np.float32)
    out = np.asarray(fused_geo_decode(params, cfg, pts, kv16, tile=256),
                     np.float32)
    assert out.shape == ref.shape
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    assert corr > 0.9999
    # bf16-matmul-level agreement relative to the logit scale
    assert np.abs(ref - out).max() < 0.05 * max(1.0, np.abs(ref).max())


def test_fused_pads_ragged_query_counts(mini_kv):
    params, cfg, kv16 = mini_kv
    # P not a multiple of the tile → zero-padded tail must be sliced away
    pts = jax.random.uniform(jax.random.PRNGKey(3), (1, 300, 3),
                             minval=-1.0, maxval=1.0)
    ref = np.asarray(sv.decode_queries(params, cfg, pts, kv16), np.float32)
    out = np.asarray(fused_geo_decode(params, cfg, pts, kv16, tile=256),
                     np.float32)
    assert out.shape == (1, 300)
    assert np.corrcoef(ref.ravel(), out.ravel())[0, 1] > 0.9999


def test_fused_gate_rules(monkeypatch):
    from hunyuan3d2_tpu.models.shapevae import (
        _fused_geo_enabled,
        _fused_geo_stream_enabled,
    )

    monkeypatch.setenv("HY3D_FUSED_GEO", "force")
    assert _fused_geo_enabled(sv.MINI)          # 512 latents, 64 head_dim
    assert not _fused_geo_enabled(sv.FULL)      # 3072 latents > VMEM budget
    assert not _fused_geo_enabled(sv.TINY)      # head_dim 32 unsupported
    # streamed kernel covers the big-KV configs the resident one excludes
    assert _fused_geo_stream_enabled(sv.FULL)   # 3072 latents: streamed
    assert not _fused_geo_stream_enabled(sv.MINI)   # resident kernel's job
    assert not _fused_geo_stream_enabled(sv.TINY)
    monkeypatch.setenv("HY3D_FUSED_GEO", "0")
    assert not _fused_geo_enabled(sv.MINI)      # kill switch
    assert not _fused_geo_stream_enabled(sv.FULL)


@pytest.fixture(scope="module")
def stream_kv():
    """Small config exercising the STREAMED kernel's phases: 256 latents in
    lc=128 chunks (KC=2 online-softmax steps) + mlp 1024 in col_chunk=512
    (C=2 MLP steps). head_dim 64 as in production."""
    cfg = sv.ShapeVAEConfig(num_latents=256, width=256, heads=4,
                            num_decoder_layers=2)
    params = jax.jit(sv.init, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.num_latents, cfg.embed_dim))
    hidden = sv.decode_latents(params, cfg, lat)
    kv = sv.compute_kv(params, cfg, hidden)
    kv16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), kv)
    return params, cfg, kv16


def test_stream_matches_decode_queries(stream_kv):
    from hunyuan3d2_tpu.ops.geo_decoder_pallas import fused_geo_decode_stream

    params, cfg, kv16 = stream_kv
    pts = jax.random.uniform(jax.random.PRNGKey(2), (1, 640, 3),
                             minval=-1.0, maxval=1.0)
    ref = np.asarray(sv.decode_queries(params, cfg, pts, kv16), np.float32)
    out = np.asarray(
        fused_geo_decode_stream(params, cfg, pts, kv16, tile=256, bk=128),
        np.float32)
    assert out.shape == ref.shape
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    assert corr > 0.9999
    assert np.abs(ref - out).max() < 0.05 * max(1.0, np.abs(ref).max())


def test_stream_single_kv_chunk_and_ragged(stream_kv):
    """KC=1 degenerate case (whole KV in one chunk) + non-tile-multiple P."""
    from hunyuan3d2_tpu.ops.geo_decoder_pallas import fused_geo_decode_stream

    params, cfg, kv16 = stream_kv
    pts = jax.random.uniform(jax.random.PRNGKey(3), (1, 300, 3),
                             minval=-1.0, maxval=1.0)
    ref = np.asarray(sv.decode_queries(params, cfg, pts, kv16), np.float32)
    out = np.asarray(
        fused_geo_decode_stream(params, cfg, pts, kv16, tile=256, bk=256),
        np.float32)
    assert out.shape == (1, 300)
    assert np.corrcoef(ref.ravel(), out.ravel())[0, 1] > 0.9999


def test_grid_decode_routes_large_latents_to_stream(monkeypatch):
    """_grid_decode_jit must pick the streamed kernel for >1024-latent
    configs when forced (and produce a sane grid end to end)."""
    import hunyuan3d2_tpu.ops.geo_decoder_pallas as gdp

    monkeypatch.setenv("HY3D_FUSED_GEO", "force")
    cfg = sv.ShapeVAEConfig(num_latents=1280, width=128, heads=2,
                            num_decoder_layers=1)
    params = jax.jit(sv.init, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.num_latents, cfg.embed_dim))
    hidden = sv.decode_latents(params, cfg, lat)
    kv = sv.compute_kv(params, cfg, hidden)

    calls = []
    real = gdp.fused_geo_decode_stream

    def spy(*a, **k):
        calls.append(a[2].shape)
        return real(*a, **k)

    monkeypatch.setattr(gdp, "fused_geo_decode_stream", spy)
    grid = sv._grid_decode_jit(params, cfg, kv, "flashvdm", 16, 4096,
                               1.01, 0.0, 8, 0.2, 2)
    assert calls, "streamed kernel was not used for 1280-latent flashvdm"
    g = np.asarray(grid, np.float32)
    assert g.shape == (1, 17, 17, 17)
    assert np.isfinite(g).all()
