"""DINOv2 ViT image encoder (giant: 1536 hidden / 40 layers / 24 heads /
patch 14 / SwiGLU FFN / LayerScale), TPU-native.

Behavioral parity: reference project/image3d/dinov2.py (from-scratch HF-free
spec of the conditioner at hy3dgen/shapegen/models/conditioner.py:127 —
``DinoImageEncoder`` wrapping HF Dinov2Model, 518×518 inputs, returns
last_hidden_state [B, 1370, 1536]).

TPU-first: patch embedding is a single reshaped matmul (14×14 conv with
stride=kernel ⇒ exact block matmul on the MXU, no conv windows); the 40-layer
encoder runs as ``lax.scan`` over stacked per-layer params.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.attention import attention, merge_heads, split_heads
from hunyuan3d2_tpu.ops.nn import Linear, layer_norm, silu

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DinoConfig:
    hidden_size: int = 1536
    num_layers: int = 40
    num_heads: int = 24
    patch_size: int = 14
    image_size: int = 518
    swiglu_hidden: int = 4096
    num_channels: int = 3
    use_swiglu_ffn: bool = True
    mlp_ratio: int = 4

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # +CLS


GIANT = DinoConfig()
# dino large (v2-mini checkpoints use DINOv2-large per reference config zoo)
LARGE = DinoConfig(hidden_size=1024, num_layers=24, num_heads=16,
                   swiglu_hidden=2730, use_swiglu_ffn=True)


def _init_layer(key, cfg: DinoConfig):
    h = cfg.hidden_size
    ks = jax.random.split(key, 8)
    p = {
        "norm1_scale": jnp.ones((h,), jnp.float32),
        "norm1_bias": jnp.zeros((h,), jnp.float32),
        "q": Linear.init(ks[0], h, h),
        "k": Linear.init(ks[1], h, h),
        "v": Linear.init(ks[2], h, h),
        "out": Linear.init(ks[3], h, h),
        "ls1": jnp.ones((h,), jnp.float32),
        "norm2_scale": jnp.ones((h,), jnp.float32),
        "norm2_bias": jnp.zeros((h,), jnp.float32),
        "ls2": jnp.ones((h,), jnp.float32),
    }
    if cfg.use_swiglu_ffn:
        p["ffn_in"] = Linear.init(ks[4], h, 2 * cfg.swiglu_hidden)
        p["ffn_out"] = Linear.init(ks[5], cfg.swiglu_hidden, h)
    else:
        p["ffn_in"] = Linear.init(ks[4], h, cfg.mlp_ratio * h)
        p["ffn_out"] = Linear.init(ks[5], cfg.mlp_ratio * h, h)
    return p


def init(key, cfg: DinoConfig = GIANT):
    ks = jax.random.split(key, 6)
    h = cfg.hidden_size
    layers = [_init_layer(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)]
    return {
        "cls_token": jax.random.normal(ks[1], (1, 1, h), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(ks[2], (1, cfg.seq_len, h), jnp.float32) * 0.02,
        # patch projection as a matmul kernel [C*P*P, H] (+ bias)
        "patch_proj": Linear.init(ks[3], cfg.num_channels * cfg.patch_size ** 2, h),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm_scale": jnp.ones((h,), jnp.float32),
        "final_norm_bias": jnp.zeros((h,), jnp.float32),
    }


def _patchify(x: Array, patch: int) -> Array:
    """[B, H, W, C] → [B, (H/p)*(W/p), C*p*p] with channel-major layout
    matching a torch Conv2d(C, hidden, kernel=p, stride=p) weight reshaped to
    [hidden, C*p*p] then transposed (see io/checkpoints.py)."""
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    # → [B, gh, gw, C, p, p] so the flat order is (c, py, px), matching the
    # torch conv-weight flatten order weight.reshape(hidden, c*p*p).
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, gh * gw, c * patch * patch)


def _layer(p, x, cfg: DinoConfig):
    h = layer_norm(x, p["norm1_scale"], p["norm1_bias"])
    q = split_heads(Linear.apply(p["q"], h), cfg.num_heads)
    k = split_heads(Linear.apply(p["k"], h), cfg.num_heads)
    v = split_heads(Linear.apply(p["v"], h), cfg.num_heads)
    attn = merge_heads(attention(q, k, v))
    x = x + Linear.apply(p["out"], attn) * p["ls1"].astype(x.dtype)

    h = layer_norm(x, p["norm2_scale"], p["norm2_bias"])
    if cfg.use_swiglu_ffn:
        x1, x2 = jnp.split(Linear.apply(p["ffn_in"], h), 2, axis=-1)
        ffn = Linear.apply(p["ffn_out"], silu(x1) * x2)
    else:
        ffn = Linear.apply(p["ffn_out"], jax.nn.gelu(Linear.apply(p["ffn_in"], h), approximate=False))
    return x + ffn * p["ls2"].astype(x.dtype)


import functools


@functools.partial(jax.jit, static_argnames=("cfg",))
def apply_jit(params, cfg: "DinoConfig", pixel_values: Array) -> Array:
    return apply(params, cfg, pixel_values)


def apply(params, cfg: DinoConfig, pixel_values: Array) -> Array:
    """pixel_values: [B, H, W, C] normalized (ImageNet mean/std).
    Returns last_hidden_state [B, 1+num_patches, hidden]."""
    b = pixel_values.shape[0]
    tokens = Linear.apply(params["patch_proj"], _patchify(pixel_values, cfg.patch_size))
    cls = jnp.broadcast_to(params["cls_token"].astype(tokens.dtype), (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    def body(xc, p):
        return _layer(p, xc, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return layer_norm(x, params["final_norm_scale"], params["final_norm_bias"])
