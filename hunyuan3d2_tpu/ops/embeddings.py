"""Positional / timestep / Fourier embeddings.

Parity targets:
  * timestep_embedding — reference hy3dgen/shapegen/models/denoisers/
    hunyuan3ddit.py:39-69 (cos|sin halves, t×1000). NOTE the reference
    forward (:392) calls ``timestep_embedding(t, 256, self.time_factor)``,
    passing time_factor=1000 POSITIONALLY into the ``max_period`` slot — so
    the production frequencies are exp(-ln(1000)·i/128), confirmed by the
    delldu spec twin's asserts (project/image3d/dit.py:41-44,
    max_period==1000). Callers here pass max_period=cfg.time_factor to
    reproduce that exact behavior (direct parity:
    tests/test_reference_parity.py).
  * fourier_embed — reference hy3dgen/shapegen/models/autoencoders/
    attention_blocks.py:36 (FourierEmbedder: cat(x, sin(x·2^k), cos(x·2^k))).
  * sincos_1d_pos_embed — reference hy3dgen/shapegen/models/conditioner.py:37
    (view embeddings of the multiview conditioner).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def timestep_embedding(t: Array, dim: int = 256, max_period: int = 10000,
                       time_factor: float = 1000.0) -> Array:
    """Sinusoidal embedding of (continuous, [0,1]-scaled) flow-match time.

    t: [B] float. Returns [B, dim] float32 with layout [cos | sin]
    (note: cos first — this matches the reference, NOT the usual sin-first).
    """
    t = t.astype(jnp.float32) * time_factor
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def fourier_embed(x: Array, num_freqs: int = 8, include_pi: bool = False) -> Array:
    """Fourier features of xyz query points.

    x: [..., D]. Returns [..., D*(2*num_freqs+1)] — cat(x, sin, cos) with
    frequencies 2^0..2^(num_freqs-1) (optionally ×π), interleaved per input
    channel as the reference does: embed = (x[...,None]*freqs).reshape(...,-1).
    """
    dtype = x.dtype
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)
    if include_pi:
        freqs = freqs * math.pi
    e = (x[..., None].astype(jnp.float32) * freqs).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(e).astype(dtype), jnp.cos(e).astype(dtype)], axis=-1)


def fourier_out_dim(input_dim: int = 3, num_freqs: int = 8) -> int:
    return input_dim * (2 * num_freqs + 1)


def sincos_1d_pos_embed(embed_dim: int, pos: Array) -> Array:
    """1D sin-cos position embedding (parity: conditioner.py:37-54,
    get_1d_sincos_pos_embed_from_grid — sin first, then cos).

    pos: [M] positions. Returns [M, embed_dim] float32.
    """
    assert embed_dim % 2 == 0
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = pos.astype(jnp.float32)[:, None] * omega[None]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)
