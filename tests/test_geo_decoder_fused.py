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
    from hunyuan3d2_tpu.models.shapevae import _fused_geo_enabled

    monkeypatch.setenv("HY3D_FUSED_GEO", "force")
    assert _fused_geo_enabled(sv.MINI)          # 512 latents, 64 head_dim
    assert not _fused_geo_enabled(sv.FULL)      # 3072 latents > VMEM budget
    assert not _fused_geo_enabled(sv.TINY)      # head_dim 32 unsupported
    monkeypatch.setenv("HY3D_FUSED_GEO", "0")
    assert not _fused_geo_enabled(sv.MINI)      # kill switch
