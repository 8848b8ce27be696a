"""Hunyuan3D-DiT — FLUX-style latent-set diffusion transformer, TPU-native.

Behavioral parity: reference hy3dgen/shapegen/models/denoisers/hunyuan3ddit.py
(Hunyuan3DDiT :284, DoubleStreamBlock :155, SingleStreamBlock :220,
Modulation :138, LastLayer :270). Configs (reference config.yaml):
  * full v2-0 / v2-mv : depth=16 double + 32 single, hidden 1024, heads 16
  * mini              : depth=8  double + 16 single
  * -Fast variants    : guidance_embed=True (guidance-distilled, no CFG)

TPU-first design choices (NOT a torch translation):
  * pure function over a parameter pytree; the whole denoiser is one jitted
    call, and the N-step sampler scans over it (pipelines/shapegen.py);
  * per-depth block parameters are STACKED along a leading axis and the block
    stack is executed with ``lax.scan`` — one compiled block body regardless
    of depth (fast compiles, identical math);
  * attention uses a Pallas flash kernel on TPU (ops/flash_attention.py) —
    sequence is cond 1370 + latents 512..3072;
  * matmuls accumulate fp32 on the MXU; norms compute fp32 (bf16 elsewhere).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.attention import attention, merge_heads, split_qkv_fused
from hunyuan3d2_tpu.ops.embeddings import timestep_embedding
from hunyuan3d2_tpu.ops.nn import Linear, dense, gelu_tanh, layer_norm, rms_norm, silu

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 64
    context_in_dim: int = 1536
    hidden_size: int = 1024
    mlp_ratio: float = 4.0
    num_heads: int = 16
    depth: int = 16
    depth_single_blocks: int = 32
    qkv_bias: bool = True
    time_factor: float = 1000.0
    guidance_embed: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)


MINI = DiTConfig(depth=8, depth_single_blocks=16)
FULL = DiTConfig(depth=16, depth_single_blocks=32)
# CI-scale config (tests / smoke): same topology, tiny widths
TINY = DiTConfig(hidden_size=128, num_heads=4, depth=2, depth_single_blocks=2,
                 context_in_dim=1536)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def _init_double_block(key, cfg: DiTConfig):
    h, mh = cfg.hidden_size, cfg.mlp_hidden
    ks = jax.random.split(key, 10)
    return {
        "img_mod": Linear.init(ks[0], h, 6 * h),
        "img_qkv": Linear.init(ks[1], h, 3 * h, bias=cfg.qkv_bias),
        "img_q_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "img_k_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "img_proj": Linear.init(ks[2], h, h),
        "img_mlp_in": Linear.init(ks[3], h, mh),
        "img_mlp_out": Linear.init(ks[4], mh, h),
        "txt_mod": Linear.init(ks[5], h, 6 * h),
        "txt_qkv": Linear.init(ks[6], h, 3 * h, bias=cfg.qkv_bias),
        "txt_q_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "txt_k_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "txt_proj": Linear.init(ks[7], h, h),
        "txt_mlp_in": Linear.init(ks[8], h, mh),
        "txt_mlp_out": Linear.init(ks[9], mh, h),
    }


def _init_single_block(key, cfg: DiTConfig):
    h, mh = cfg.hidden_size, cfg.mlp_hidden
    ks = jax.random.split(key, 3)
    return {
        "mod": Linear.init(ks[0], h, 3 * h),
        "linear1": Linear.init(ks[1], h, 3 * h + mh),
        "linear2": Linear.init(ks[2], h + mh, h),
        "q_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "k_scale": jnp.ones((cfg.head_dim,), jnp.float32),
    }


def init(key, cfg: DiTConfig = FULL):
    """Initialize a DiT parameter pytree. Per-layer params are stacked along
    axis 0 (``double_blocks`` leaves have leading dim cfg.depth, etc.)."""
    ks = jax.random.split(key, 9)
    h = cfg.hidden_size
    params = {
        "latent_in": Linear.init(ks[0], cfg.in_channels, h),
        "cond_in": Linear.init(ks[1], cfg.context_in_dim, h),
        "time_in": {
            "in_layer": Linear.init(ks[2], 256, h),
            "out_layer": Linear.init(ks[3], h, h),
        },
        "double_blocks": _stack_init(ks[4], cfg.depth, _init_double_block, cfg),
        "single_blocks": _stack_init(ks[5], cfg.depth_single_blocks, _init_single_block, cfg),
        "final_layer": {
            "adaLN": Linear.init(ks[6], h, 2 * h),
            "linear": Linear.init(ks[7], h, cfg.in_channels),
        },
    }
    if cfg.guidance_embed:
        kg1, kg2 = jax.random.split(ks[8])
        params["guidance_in"] = {
            "in_layer": Linear.init(kg1, 256, h),
            "out_layer": Linear.init(kg2, h, h),
        }
    return params


def _stack_init(key, depth, fn, cfg):
    blocks = [fn(k, cfg) for k in jax.random.split(key, depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------
def _mlp_embed(p, x):
    return Linear.apply(p["out_layer"], silu(Linear.apply(p["in_layer"], x)))


def _modulation(p, vec, n: int):
    """SiLU→Linear→chunk(n). Returns list of [B, 1, H] modulation tensors."""
    out = Linear.apply(p, silu(vec))[:, None, :]
    return jnp.split(out, n, axis=-1)


def _double_block(p, img, txt, vec, cfg: DiTConfig):
    im = _modulation(p["img_mod"], vec, 6)
    tm = _modulation(p["txt_mod"], vec, 6)

    img_mod = (1.0 + im[1]) * layer_norm(img) + im[0]
    img_qkv = Linear.apply(p["img_qkv"], img_mod)
    iq, ik, iv = split_qkv_fused(img_qkv, cfg.num_heads)
    iq = rms_norm(iq, p["img_q_scale"])
    ik = rms_norm(ik, p["img_k_scale"])

    txt_mod = (1.0 + tm[1]) * layer_norm(txt) + tm[0]
    txt_qkv = Linear.apply(p["txt_qkv"], txt_mod)
    tq, tk, tv = split_qkv_fused(txt_qkv, cfg.num_heads)
    tq = rms_norm(tq, p["txt_q_scale"])
    tk = rms_norm(tk, p["txt_k_scale"])

    # joint attention over [txt | img] tokens (reference DoubleStreamBlock:155)
    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    attn = merge_heads(attention(q, k, v))
    txt_attn, img_attn = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]

    img = img + im[2] * Linear.apply(p["img_proj"], img_attn)
    img = img + im[5] * Linear.apply(
        p["img_mlp_out"], gelu_tanh(Linear.apply(p["img_mlp_in"], (1.0 + im[4]) * layer_norm(img) + im[3]))
    )
    txt = txt + tm[2] * Linear.apply(p["txt_proj"], txt_attn)
    txt = txt + tm[5] * Linear.apply(
        p["txt_mlp_out"], gelu_tanh(Linear.apply(p["txt_mlp_in"], (1.0 + tm[4]) * layer_norm(txt) + tm[3]))
    )
    return img, txt


def _single_block(p, x, vec, cfg: DiTConfig):
    shift, scale, gate = _modulation(p["mod"], vec, 3)
    x_mod = (1.0 + scale) * layer_norm(x) + shift
    h = Linear.apply(p["linear1"], x_mod)
    qkv, mlp = h[..., : 3 * cfg.hidden_size], h[..., 3 * cfg.hidden_size:]
    q, k, v = split_qkv_fused(qkv, cfg.num_heads)
    q = rms_norm(q, p["q_scale"])
    k = rms_norm(k, p["k_scale"])
    attn = merge_heads(attention(q, k, v))
    out = Linear.apply(p["linear2"], jnp.concatenate([attn, gelu_tanh(mlp)], axis=-1))
    return x + gate * out


def apply(params, cfg: DiTConfig, x: Array, t: Array, cond: Array,
          guidance: Optional[Array] = None) -> Array:
    """Denoise one step.

    x:    [B, L, in_channels]  latent token set
    t:    [B]                  flow-match time in [0, 1]
    cond: [B, Lc, context_in_dim]  image-encoder tokens
    guidance: [B] guidance strength, required iff cfg.guidance_embed.
    Returns velocity prediction [B, L, in_channels].
    """
    cond = cond.astype(x.dtype)  # unify compute dtype (scan carries must match)
    latent = Linear.apply(params["latent_in"], x)
    # hunyuan3ddit.py:392 passes time_factor positionally into max_period —
    # the production model runs with max_period == time_factor == 1000
    vec = _mlp_embed(params["time_in"], timestep_embedding(
        t, 256, max_period=cfg.time_factor, time_factor=cfg.time_factor).astype(latent.dtype))
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("guidance strength required for a guidance-distilled model")
        vec = vec + _mlp_embed(
            params["guidance_in"],
            timestep_embedding(guidance, 256, max_period=cfg.time_factor,
                               time_factor=cfg.time_factor).astype(latent.dtype),
        )
    cond = Linear.apply(params["cond_in"], cond)

    def dbl(carry, p):
        img, txt = carry
        return _double_block(p, img, txt, vec, cfg), None

    (latent, cond), _ = jax.lax.scan(dbl, (latent, cond), params["double_blocks"])

    xcat = jnp.concatenate([cond, latent], axis=1)

    def sgl(xc, p):
        return _single_block(p, xc, vec, cfg), None

    xcat, _ = jax.lax.scan(sgl, xcat, params["single_blocks"])
    latent = xcat[:, cond.shape[1]:]

    fl = params["final_layer"]
    shift, scale = jnp.split(Linear.apply(fl["adaLN"], silu(vec)), 2, axis=-1)
    latent = (1.0 + scale[:, None]) * layer_norm(latent) + shift[:, None]
    return Linear.apply(fl["linear"], latent)


class Hunyuan3DDiT:
    """Object façade for the config registry (parity: the reference class
    name instantiated from config.yaml, hy3dgen/shapegen/models/denoisers/
    hunyuan3ddit.py:284). Holds (cfg, params) and dispatches to the pure
    functions; params are attached by the checkpoint loader."""

    def __init__(self, params=None, **cfg_kwargs):
        fields = {k: v for k, v in cfg_kwargs.items()
                  if k in DiTConfig.__dataclass_fields__}
        self.cfg = DiTConfig(**fields)
        self.params = params
        self.guidance_embed = self.cfg.guidance_embed

    def init_random(self, key):
        self.params = init(key, self.cfg)
        return self

    def __call__(self, x, t, cond, guidance=None):
        return apply(self.params, self.cfg, x, t, cond, guidance)
