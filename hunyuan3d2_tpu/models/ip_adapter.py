"""IP-Adapter: image-prompt conditioning for the SD-class UNets.

Behavioral parity: the reference loads 'h94/IP-Adapter'
(ip-adapter-plus_sd15.safetensors) onto its SD1.5 ControlNet pipeline at
scale 0.7 (hy3dgen/texgen/utils/alignImg4Tex_utils.py:29-30) and the SDXL
variant (:92-93). Two parts:

  * image projection — 'plus' variant: a Perceiver Resampler over the CLIP
    vision penultimate hidden states (learned latent queries cross-attend to
    the image tokens; depth×(attn+FF) blocks, 16 query tokens out); plain
    variant: one Linear from the pooled CLIP embed to
    num_tokens×cross_attention_dim + LayerNorm.
  * decoupled attention — every attn2 gains to_k_ip/to_v_ip projections over
    the image tokens, and the scaled image-attention branch is summed with
    the text branch before to_out (implemented in paint_unet._tblock, keyed
    on the params carrying "to_k_ip").

``add_ip_adapter`` grafts zero-initialized to_k_ip/to_v_ip onto an existing
UNet/ControlNet param tree, making the adapter an exact no-op at init (the
invariant the tests pin); real checkpoints overwrite them via
io/diffusers_maps.load_ip_adapter_weights.

TPU-first: the resampler is a handful of [16, D]×[T, D] matmuls — it runs
once per image, fused into the same jitted program as the first denoise
step; all attention uses the shared bf16-MXU/fp32-softmax op.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.attention import attention as attn_op
from hunyuan3d2_tpu.ops.attention import merge_heads, split_heads
from hunyuan3d2_tpu.ops.nn import Linear, layer_norm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 768              # inner width
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280   # CLIP ViT-H/14 hidden (ip-adapter-plus_sd15)
    output_dim: int = 768       # UNet cross_attention_dim
    ff_mult: int = 4


PLUS_SD15 = ResamplerConfig()
TINY = ResamplerConfig(dim=32, depth=1, dim_head=8, heads=2, num_queries=4,
                       embedding_dim=48, output_dim=32, ff_mult=2)


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_resampler(key, cfg: ResamplerConfig = PLUS_SD15):
    ks = iter(jax.random.split(key, 4 + 8 * cfg.depth))

    def nk():
        return next(ks)

    inner = cfg.dim_head * cfg.heads
    p = {
        "latents": jax.random.normal(nk(), (cfg.num_queries, cfg.dim),
                                     jnp.float32) / cfg.dim ** 0.5,
        "proj_in": Linear.init(nk(), cfg.embedding_dim, cfg.dim),
        "proj_out": Linear.init(nk(), cfg.dim, cfg.output_dim),
        "norm_out": _ln_init(cfg.output_dim),
        "layers": [],
    }
    for _ in range(cfg.depth):
        p["layers"].append({
            "norm1": _ln_init(cfg.dim),                 # on image tokens
            "norm2": _ln_init(cfg.dim),                 # on latents
            "to_q": Linear.init(nk(), cfg.dim, inner, bias=False),
            "to_kv": Linear.init(nk(), cfg.dim, 2 * inner, bias=False),
            "to_out": Linear.init(nk(), inner, cfg.dim, bias=False),
            "ff_norm": _ln_init(cfg.dim),
            "ff_in": Linear.init(nk(), cfg.dim, cfg.ff_mult * cfg.dim,
                                 bias=False),
            "ff_out": Linear.init(nk(), cfg.ff_mult * cfg.dim, cfg.dim,
                                  bias=False),
        })
    return p


def apply_resampler(p, cfg: ResamplerConfig, image_embeds: Array) -> Array:
    """[B, T, embedding_dim] CLIP hidden states → [B, num_queries,
    output_dim] IP tokens (original IP-Adapter resampler.py semantics:
    q from latents, kv from concat(image tokens, latents))."""
    b = image_embeds.shape[0]
    x = Linear.apply(p["proj_in"], image_embeds)
    lat = jnp.broadcast_to(p["latents"][None].astype(x.dtype),
                           (b,) + p["latents"].shape)
    for lp in p["layers"]:
        xh = layer_norm(x, lp["norm1"]["scale"], lp["norm1"]["bias"])
        lh = layer_norm(lat, lp["norm2"]["scale"], lp["norm2"]["bias"])
        kv_in = jnp.concatenate([xh, lh], axis=1)
        q = split_heads(Linear.apply(lp["to_q"], lh), cfg.heads)
        k, v = jnp.split(Linear.apply(lp["to_kv"], kv_in), 2, axis=-1)
        out = attn_op(q, split_heads(k, cfg.heads), split_heads(v, cfg.heads))
        lat = lat + Linear.apply(lp["to_out"], merge_heads(out))
        lh = layer_norm(lat, lp["ff_norm"]["scale"], lp["ff_norm"]["bias"])
        lat = lat + Linear.apply(
            lp["ff_out"], jax.nn.gelu(Linear.apply(lp["ff_in"], lh),
                                      approximate=False))
    out = Linear.apply(p["proj_out"], lat)
    return layer_norm(out, p["norm_out"]["scale"], p["norm_out"]["bias"])


def init_image_proj(key, clip_embed_dim: int, cross_dim: int,
                    num_tokens: int = 4):
    """Plain (non-plus) IP-Adapter ImageProjModel: pooled CLIP embed →
    num_tokens context rows."""
    return {"proj": Linear.init(key, clip_embed_dim, num_tokens * cross_dim),
            "norm": _ln_init(cross_dim), "num_tokens": num_tokens}


def apply_image_proj(p, pooled: Array) -> Array:
    b = pooled.shape[0]
    x = Linear.apply(p["proj"], pooled).reshape(b, p["num_tokens"], -1)
    return layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])


def _iter_attn2(params):
    for blk in params["down"]:
        for t2d in blk["attns"]:
            yield t2d["block"]["attn2"]
    yield params["mid"]["attn"]["block"]["attn2"]
    for blk in params.get("up", []):
        for t2d in blk["attns"]:
            yield t2d["block"]["attn2"]


def add_ip_adapter(params, cross_dim: int):
    """Graft ZERO-initialized to_k_ip/to_v_ip onto every attn2 of a UNet (or
    ControlNet) param tree, in place. Zero K_ip ⇒ uniform attention over
    zero V_ip ⇒ the image branch contributes exactly 0 until real weights
    load — forward outputs are bit-identical to the pre-graft tree."""
    for a in _iter_attn2(params):
        dim = a["to_q"]["w"].shape[1]
        a["to_k_ip"] = {"w": jnp.zeros((cross_dim, dim), jnp.float32)}
        a["to_v_ip"] = {"w": jnp.zeros((cross_dim, dim), jnp.float32)}
    if "dual" in params:
        add_ip_adapter(params["dual"], cross_dim)
    return params
