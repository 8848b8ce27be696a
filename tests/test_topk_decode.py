"""FlashVDM top-k KV decode correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.models import shapevae


CFG = shapevae.ShapeVAEConfig(num_latents=24, embed_dim=8, width=32, heads=2,
                              num_decoder_layers=1)


def _setup():
    params = shapevae.init(jax.random.PRNGKey(0), CFG)
    latents = jnp.asarray(np.random.RandomState(0).randn(1, 24, 8), jnp.float32)
    hidden = shapevae.decode_latents(params, CFG, latents)
    kv = shapevae.compute_kv(params, CFG, hidden)
    queries = jnp.asarray(
        np.random.RandomState(1).uniform(-1, 1, (1, 64, 3)), jnp.float32)
    return params, kv, queries


def test_topk_full_k_equals_dense():
    """k_top = L must reproduce the dense decode exactly (same math)."""
    params, kv, queries = _setup()
    dense = np.asarray(shapevae.decode_queries(params, CFG, queries, kv))
    topk = np.asarray(shapevae.decode_queries_topk(
        params, CFG, queries, kv, k_top=24, group_size=32))
    np.testing.assert_allclose(topk, dense, atol=1e-5, rtol=1e-5)


def test_topk_pruned_close_to_dense():
    """Aggressive pruning still approximates the dense result (softmax mass
    concentrates on the top keys)."""
    params, kv, queries = _setup()
    dense = np.asarray(shapevae.decode_queries(params, CFG, queries, kv))
    topk = np.asarray(shapevae.decode_queries_topk(
        params, CFG, queries, kv, k_top=16, group_size=32))
    assert np.isfinite(topk).all()
    # correlation stays high even under 33% pruning
    c = np.corrcoef(dense.reshape(-1), topk.reshape(-1))[0, 1]
    assert c > 0.98, c
