"""Unit tests for the NN primitive layer, checked against independent
torch/numpy computations of the same math (the reference's golden-stat
strategy, SURVEY.md §4.2, applied as cross-framework parity at module level)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from hunyuan3d2_tpu.ops.attention import sdpa, split_heads, split_qkv_fused
from hunyuan3d2_tpu.ops.embeddings import (
    fourier_embed,
    sincos_1d_pos_embed,
    timestep_embedding,
)
from hunyuan3d2_tpu.ops.nn import dense, gelu_tanh, layer_norm, rms_norm


def test_timestep_embedding_matches_reference_math():
    t = np.array([0.0, 0.25, 1.0], np.float32)
    ours = np.asarray(timestep_embedding(jnp.asarray(t), 256))
    # independent torch computation of the documented formula
    tt = torch.tensor(t) * 1000.0
    half = 128
    # max_period=10000 — reference hunyuan3ddit.py:39 (audited round 2)
    freqs = torch.exp(-np.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = tt[:, None] * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)  # fp32 exp/cos ULP noise
    assert ours.shape == (3, 256)
    # t=0 → cos half all ones, sin half all zeros
    np.testing.assert_allclose(ours[0, :128], 1.0, atol=1e-6)
    np.testing.assert_allclose(ours[0, 128:], 0.0, atol=1e-6)


def test_fourier_embed_layout():
    x = np.random.RandomState(0).randn(2, 5, 3).astype(np.float32)
    out = np.asarray(fourier_embed(jnp.asarray(x), num_freqs=8))
    assert out.shape == (2, 5, 51)
    np.testing.assert_allclose(out[..., :3], x, atol=1e-6)
    # interleaved (channel-major) frequency layout: embed[..., 3 + 3*k + c]
    # corresponds to sin(x_c * 2^k)? reference reshapes (x[...,None]*freqs)
    # with freqs last ⇒ layout is [c0*f0..c0*f7, c1*f0..], i.e. channel-major.
    freqs = 2.0 ** np.arange(8)
    e = (x[..., None] * freqs).reshape(2, 5, 24)
    np.testing.assert_allclose(out[..., 3:27], np.sin(e), atol=1e-5)
    np.testing.assert_allclose(out[..., 27:], np.cos(e), atol=1e-5)


def test_sincos_view_embedding_matches_reference_math():
    emb = np.asarray(sincos_1d_pos_embed(1536, jnp.arange(4)))
    omega = np.arange(768, dtype=np.float64) / 768.0
    omega = 1.0 / 10000 ** omega
    out = np.arange(4)[:, None] * omega[None]
    ref = np.concatenate([np.sin(out), np.cos(out)], axis=-1)
    np.testing.assert_allclose(emb, ref, atol=1e-5)


def test_layer_norm_vs_torch():
    x = np.random.RandomState(1).randn(2, 7, 64).astype(np.float32)
    s = np.random.RandomState(2).rand(64).astype(np.float32)
    b = np.random.RandomState(3).randn(64).astype(np.float32)
    ours = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b)))
    ref = F.layer_norm(torch.tensor(x), (64,), torch.tensor(s), torch.tensor(b),
                       eps=1e-6).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_rms_norm_vs_torch():
    x = np.random.RandomState(4).randn(2, 3, 64).astype(np.float32)
    s = np.random.RandomState(5).rand(64).astype(np.float32)
    xt = torch.tensor(x)
    rrms = torch.rsqrt(torch.mean(xt ** 2, dim=-1, keepdim=True) + 1e-6)
    ref = ((xt * rrms) * torch.tensor(s)).numpy()
    ours = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(s)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sdpa_vs_torch():
    rs = np.random.RandomState(6)
    q = rs.randn(2, 4, 16, 32).astype(np.float32)
    k = rs.randn(2, 4, 24, 32).astype(np.float32)
    v = rs.randn(2, 4, 24, 32).astype(np.float32)
    ours = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ref = F.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_split_qkv_fused_matches_einops_layout():
    """torch layout: rearrange(qkv, 'B L (K H D) -> K B H L D')."""
    rs = np.random.RandomState(7)
    qkv = rs.randn(2, 5, 3 * 4 * 8).astype(np.float32)
    q, k, v = split_qkv_fused(jnp.asarray(qkv), num_heads=4)
    ref = qkv.reshape(2, 5, 3, 4, 8).transpose(2, 0, 3, 1, 4)
    np.testing.assert_allclose(np.asarray(q), ref[0], atol=0)
    np.testing.assert_allclose(np.asarray(k), ref[1], atol=0)
    np.testing.assert_allclose(np.asarray(v), ref[2], atol=0)


def test_dense_bias_and_accumulation():
    x = jnp.ones((4, 8), jnp.bfloat16)
    w = jnp.full((8, 3), 0.125, jnp.bfloat16)
    b = jnp.ones((3,), jnp.bfloat16)
    y = dense(x, w, b)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y, np.float32), 2.0, rtol=1e-2)
