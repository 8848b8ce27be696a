"""FlashVDM top-k KV decode correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.models import shapevae


CFG = shapevae.ShapeVAEConfig(num_latents=24, embed_dim=8, width=32, heads=2,
                              num_decoder_layers=1)


try:
    from scipy.special import erf as _erf
except ImportError:  # pragma: no cover
    _erf = None


def gelu_exact_np(x):
    if _erf is not None:
        return 0.5 * x * (1.0 + _erf(x / np.sqrt(2.0)))
    import torch

    return torch.nn.functional.gelu(torch.from_numpy(x)).numpy()


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


def test_topm_merge_all_activated_equals_dense():
    """'merge' mode with k_top=L and every key activated (small L ⇒ softmax
    mass ≫ 1e-6 everywhere) must reproduce the dense decode exactly."""
    params, kv, queries = _setup()
    dense = np.asarray(shapevae.decode_queries(params, CFG, queries, kv))
    topm = np.asarray(shapevae.decode_queries_pruned(
        params, CFG, queries, kv, k_top=24, group_size=32, mode="merge"))
    np.testing.assert_allclose(topm, dense, atol=1e-5, rtol=1e-5)


def test_topm_matches_reference_activation_semantics():
    """Check the static-shape 'merge' redesign against a numpy emulation of
    the reference FlashVDMTopMCrossAttentionProcessor (variable-length gather
    of keys whose softmax activation, subsample ::30, mean over heads,
    exceeds 1e-6 — attention_processors.py:84-96) for a case where the
    activated set fits the static capacity."""
    params, kv, queries = _setup()
    k, v = (np.asarray(t, np.float32) for t in kv)   # [1, H, L, D]
    g = {kk: {kkk: np.asarray(vvv, np.float32) for kkk, vvv in vv.items()}
         if isinstance(vv, dict) else np.asarray(vv, np.float32)
         for kk, vv in params["geo_decoder"].items()}

    # recompute q exactly as decode_queries_pruned does (fp32 host mirror)
    from hunyuan3d2_tpu.ops.embeddings import fourier_embed

    q_in = np.asarray(fourier_embed(queries, CFG.num_freqs, CFG.include_pi),
                      np.float32)
    x = q_in @ np.asarray(params["geo_decoder"]["query_proj"]["w"], np.float32) \
        + np.asarray(params["geo_decoder"]["query_proj"]["b"], np.float32)

    def ln(a, s, b_, eps=1e-6):
        m = a.mean(-1, keepdims=True)
        vv = ((a - m) ** 2).mean(-1, keepdims=True)
        return (a - m) / np.sqrt(vv + eps) * s + b_

    h = ln(x, g["ln_1_scale"], g["ln_1_bias"])
    q = h @ np.asarray(params["geo_decoder"]["c_q"]["w"], np.float32)
    b, p, _ = q.shape
    hd = CFG.head_dim
    q = q.reshape(b, p, CFG.heads, hd)
    q = ln(q, g["q_norm_scale"], g["q_norm_bias"])
    qh = q.transpose(0, 2, 1, 3)                      # [1, H, P, D]

    # reference: q1 = q[:, :, ::30]; sim softmax over keys; mean over heads;
    # union of activated keys over subsampled queries
    q1 = qh[:, :, ::30]
    sim = np.einsum("bhqd,bhld->bhql", q1, k)
    sm = np.exp(sim - sim.max(-1, keepdims=True))
    sm = sm / sm.sum(-1, keepdims=True)
    act = sm.mean(1)                                   # [1, Q1, L]
    activated = sorted(set(np.where(act > 1e-6)[2]))

    # reference gathers k0/v0 at activated indices then plain SDPA
    k0, v0 = k[:, :, activated], v[:, :, activated]
    logits = np.einsum("bhqd,bhkd->bhqk", qh, k0) / np.sqrt(hd)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref_attn = np.einsum("bhqk,bhkd->bhqd", w, v0)

    # ours: run merge mode with capacity ≥ |activated| and extract the same
    # intermediate by reconstructing from the pruned decode path — compare at
    # the final occupancy level instead (full pipeline through the MLP)
    ours = np.asarray(shapevae.decode_queries_pruned(
        params, CFG, queries, kv, k_top=24, group_size=64, mode="merge"))

    # numpy continuation of the reference attention → occupancy
    attn = ref_attn.transpose(0, 2, 1, 3).reshape(b, p, CFG.heads * hd)
    x2 = x + attn @ np.asarray(params["geo_decoder"]["c_proj"]["w"], np.float32) \
        + np.asarray(params["geo_decoder"]["c_proj"]["b"], np.float32)
    h2 = ln(x2, g["ln_3_scale"], g["ln_3_bias"])
    x3 = x2 + gelu_exact_np(
        h2 @ np.asarray(params["geo_decoder"]["mlp_fc"]["w"], np.float32)
        + np.asarray(params["geo_decoder"]["mlp_fc"]["b"], np.float32)) \
        @ np.asarray(params["geo_decoder"]["mlp_proj"]["w"], np.float32) \
        + np.asarray(params["geo_decoder"]["mlp_proj"]["b"], np.float32)
    x3 = ln(x3, g["ln_post_scale"], g["ln_post_bias"])
    ref = (x3 @ np.asarray(params["geo_decoder"]["output_proj"]["w"], np.float32)
           + np.asarray(params["geo_decoder"]["output_proj"]["b"], np.float32))[..., 0]

    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=2e-2)


def test_pruned_path_at_production_scale_3072():
    """Exercise the pruned decode with the full-VAE latent count (3072 →
    k rule 1024, attention_processors.py:41-42) on a thin config."""
    cfg = shapevae.ShapeVAEConfig(num_latents=3072, embed_dim=8, width=32,
                                  heads=2, num_decoder_layers=1)
    params = shapevae.init(jax.random.PRNGKey(0), cfg)
    latents = jnp.asarray(np.random.RandomState(0).randn(1, 3072, 8), jnp.float32)
    hidden = shapevae.decode_latents(params, cfg, latents)
    kv = shapevae.compute_kv(params, cfg, hidden)
    queries = jnp.asarray(
        np.random.RandomState(1).uniform(-1, 1, (1, 1024, 3)), jnp.float32)
    dense = np.asarray(shapevae.decode_queries(params, cfg, queries, kv))
    for mode in ("mean", "merge"):
        pruned = np.asarray(shapevae.decode_queries_pruned(
            params, cfg, queries, kv, k_top=1024, group_size=512, mode=mode))
        assert np.isfinite(pruned).all()
        c = np.corrcoef(dense.reshape(-1), pruned.reshape(-1))[0, 1]
        assert c > 0.95, (mode, c)
