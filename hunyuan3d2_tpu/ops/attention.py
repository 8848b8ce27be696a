"""Attention primitives.

``sdpa`` is the baseline XLA scaled-dot-product attention with fp32 softmax;
the Pallas flash-attention kernel (ops/flash_attention.py) is swapped in for
long sequences on TPU backends. This mirrors the reference's swappable
attention (SDPA vs SageAttention via env, hunyuan3ddit.py:25-30) but selects
by backend/sequence-length instead of env flags.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

Array = jax.Array


def sdpa(q: Array, k: Array, v: Array, scale: float | None = None,
         mask: Array | None = None) -> Array:
    """Scaled dot-product attention.

    q: [B, H, Lq, D], k/v: [B, H, Lk, D]. Returns [B, H, Lq, D] in q.dtype.
    Softmax in fp32 for numerical parity with the torch reference.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.lru_cache()
def is_tpu_backend() -> bool:
    """True when the default JAX backend is a TPU (incl. PJRT plugins whose
    platform string differs but whose devices report 'tpu')."""
    if jax.default_backend() == "tpu":
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.lru_cache()
def _use_flash() -> bool:
    if os.environ.get("HY3D_TPU_DISABLE_FLASH", "0") == "1":
        return False
    return is_tpu_backend()


def attention(q: Array, k: Array, v: Array, scale: float | None = None,
              mask: Array | None = None) -> Array:
    """Backend-dispatching attention. On TPU with no mask and long-enough
    sequences, uses the Pallas flash kernel; otherwise plain XLA sdpa."""
    if mask is None and _use_flash() and q.shape[-2] >= 512 and q.shape[-1] in (64, 128):
        try:
            from hunyuan3d2_tpu.ops.flash_attention import flash_attention

            return flash_attention(q, k, v, scale=scale)
        except Exception:
            pass
    return sdpa(q, k, v, scale=scale, mask=mask)


def masked_attention(q: Array, k: Array, v: Array, mask: Array,
                     scale: float | None = None) -> Array:
    """Attention with a per-batch boolean mask [B, Lq, Lk] shared across
    heads (the paint UNet's turbo voxel-locality mask). On TPU with
    long-enough sequences the Pallas masked flash kernel streams the mask
    as bool tiles; the sdpa fallback materializes [B, H, Lq, Lk] fp32
    scores (1.5 GB at L=6144, H=10 — fine on CPU tests, wasteful on HBM)."""
    if _use_flash() and q.shape[-2] >= 512 and q.shape[-1] in (64, 128):
        try:
            from hunyuan3d2_tpu.ops.flash_attention import flash_attention_masked

            return flash_attention_masked(q, k, v, mask, scale=scale)
        except Exception:
            pass
    return sdpa(q, k, v, scale=scale, mask=mask[:, None])


def merge_heads(x: Array) -> Array:
    """[B, H, L, D] → [B, L, H*D]."""
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


def split_heads(x: Array, num_heads: int) -> Array:
    """[B, L, H*D] → [B, H, L, D]."""
    b, l, hd = x.shape
    return x.reshape(b, l, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def split_qkv_fused(qkv: Array, num_heads: int):
    """Split a fused qkv projection laid out as (K=3, H, D) on the last axis
    — torch layout ``rearrange(qkv, 'B L (K H D) -> K B H L D')`` —
    into q, k, v each [B, H, L, D]."""
    b, l, w = qkv.shape
    d = w // (3 * num_heads)
    x = qkv.reshape(b, l, 3, num_heads, d)
    q, k, v = (x[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    return q, k, v
