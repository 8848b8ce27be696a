"""HunyuanDiT — text→image latent diffusion transformer, TPU-native.

Behavioral parity: the reference's text-to-3D front-end constructs a
diffusers ``HunyuanDiTPipeline`` (hy3dgen/text2image.py:30-47,
``Tencent-Hunyuan/HunyuanDiT-v1.1-Diffusers-Distilled`` with PAG on blocks
16-19). diffusers is not importable in this image, so the architecture below
is built to the diffusers ``HunyuanDiT2DModel`` contract (v1.1 class:
patch-2 embed, 40 U-ViT blocks with long skips in the second half,
per-head-LN qk norm, 2D interleaved rotary on image tokens, dual text
stream CLIP[77,1024] ⊕ projected mT5[256,2048→1024] with learned padding
rows, combined timestep + T5-attention-pool + image-meta-size + style
conditioning, AdaLN-continuous output head, 8 output channels =
epsilon/v + learned variance); the weight map (io/diffusers_maps.py)
follows the diffusers state-dict names so real checkpoints load directly.

TPU-first design (same idioms as models/dit.py):
  * pure function over a parameter pytree; per-layer params STACKED and the
    block stack executed with ``lax.scan`` — two scans (pre-skip stack, then
    skip stack consuming the first scan's stacked outputs as scanned xs);
  * PAG (perturbed-attention guidance) is a per-layer boolean scan input:
    the perturbed branch replaces the self-attention map with identity
    (attn_out := V) — no Python branching inside the compiled body;
  * attention via ops.attention (Pallas flash on TPU), bf16 matmuls with
    fp32 norms; rotary tables precomputed once per resolution.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.attention import attention, merge_heads, split_heads
from hunyuan3d2_tpu.ops.embeddings import timestep_embedding
from hunyuan3d2_tpu.ops.nn import Linear, gelu_tanh, layer_norm, silu

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class HunyuanDiTConfig:
    in_channels: int = 4
    out_channels: int = 8          # first 4 = prediction, last 4 = variance
    patch_size: int = 2
    hidden_size: int = 1408
    num_heads: int = 16
    depth: int = 40
    mlp_ratio: float = 4.0
    text_dim: int = 1024           # CLIP (Chinese BERT) hidden
    text_len: int = 77
    t5_dim: int = 2048             # mT5 encoder hidden
    t5_len: int = 256
    pooled_dim: int = 1024         # T5 attention-pool output
    style_classes: int = 1         # v1.0 style embedding table size
    meta_dims: int = 6             # image_meta_size: (h, w, th, tw, cx, cy)
    # diffusers use_style_cond_and_image_meta_size: True for v1.0 checkpoints,
    # False for v1.1/v1.2 (extra conditioning = pooled text only)
    use_style_meta: bool = True
    pag_layers: tuple = (16, 17, 18, 19)  # text2image.py:40 pag_applied_layers

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def n_pre(self) -> int:
        """Blocks before the skip-consuming stack (layers 0..depth//2)."""
        return self.depth // 2 + 1

    @property
    def n_skip(self) -> int:
        return self.depth - self.n_pre


FULL = HunyuanDiTConfig()
TINY = HunyuanDiTConfig(hidden_size=64, num_heads=2, depth=4, text_dim=32,
                        text_len=8, t5_dim=48, t5_len=12, pooled_dim=32,
                        pag_layers=(1,))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def _init_block(key, cfg: HunyuanDiTConfig, skip: bool):
    h, hd, mh = cfg.hidden_size, cfg.head_dim, cfg.mlp_hidden
    ks = jax.random.split(key, 12)
    p = {
        # AdaLayerNormShift: LN(affine) + shift from SiLU→Linear(temb)
        "norm1_scale": jnp.ones((h,), jnp.float32),
        "norm1_bias": jnp.zeros((h,), jnp.float32),
        "norm1_linear": Linear.init(ks[0], h, h),
        "attn1": {
            "q": Linear.init(ks[1], h, h), "k": Linear.init(ks[2], h, h),
            "v": Linear.init(ks[3], h, h), "out": Linear.init(ks[4], h, h),
            # qk_norm='layer_norm': per-head LN with learned affine
            "q_norm_scale": jnp.ones((hd,), jnp.float32),
            "q_norm_bias": jnp.zeros((hd,), jnp.float32),
            "k_norm_scale": jnp.ones((hd,), jnp.float32),
            "k_norm_bias": jnp.zeros((hd,), jnp.float32),
        },
        "norm2_scale": jnp.ones((h,), jnp.float32),
        "norm2_bias": jnp.zeros((h,), jnp.float32),
        "attn2": {
            "q": Linear.init(ks[5], h, h),
            "k": Linear.init(ks[6], cfg.text_dim, h),
            "v": Linear.init(ks[7], cfg.text_dim, h),
            "out": Linear.init(ks[8], h, h),
            "q_norm_scale": jnp.ones((hd,), jnp.float32),
            "q_norm_bias": jnp.zeros((hd,), jnp.float32),
            "k_norm_scale": jnp.ones((hd,), jnp.float32),
            "k_norm_bias": jnp.zeros((hd,), jnp.float32),
        },
        "norm3_scale": jnp.ones((h,), jnp.float32),
        "norm3_bias": jnp.zeros((h,), jnp.float32),
        "mlp_in": Linear.init(ks[9], h, mh),
        "mlp_out": Linear.init(ks[10], mh, h),
    }
    if skip:
        k1, k2 = jax.random.split(ks[11])
        p["skip_norm_scale"] = jnp.ones((2 * h,), jnp.float32)
        p["skip_norm_bias"] = jnp.zeros((2 * h,), jnp.float32)
        p["skip_linear"] = Linear.init(k1, 2 * h, h)
    return p


def _stack_init(key, n, cfg, skip):
    blocks = [_init_block(k, cfg, skip) for k in jax.random.split(key, n)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init(key, cfg: HunyuanDiTConfig = FULL):
    h = cfg.hidden_size
    ks = jax.random.split(key, 12)
    pooled_in = cfg.pooled_dim + (
        (256 * cfg.meta_dims + 128) if cfg.use_style_meta else 0)
    return {
        # patch embed: conv(patch,patch,stride patch) stored as a linear over
        # flattened patches [p*p*in → h] (diffusers pos_embed.proj)
        "patch_embed": Linear.init(ks[0], cfg.patch_size ** 2 * cfg.in_channels, h),
        "text_embedder": {   # mT5 2048 → 1024 (PixArtAlpha-style 2-layer MLP)
            "fc1": Linear.init(ks[1], cfg.t5_dim, cfg.t5_dim * 4),
            "fc2": Linear.init(ks[2], cfg.t5_dim * 4, cfg.text_dim),
        },
        # learned rows substituted where the (clip ⊕ t5) text mask is 0
        "text_embedding_padding": jax.random.normal(
            ks[3], (cfg.text_len + cfg.t5_len, cfg.text_dim), jnp.float32) * 0.02,
        "timestep_embedder": {
            "in_layer": Linear.init(ks[4], 256, h),
            "out_layer": Linear.init(ks[5], h, h),
        },
        "pooler": {          # T5 attention pool (CLIP-style, 8 heads)
            "pos": jax.random.normal(ks[6], (cfg.t5_len + 1, cfg.t5_dim),
                                     jnp.float32) / cfg.t5_dim ** 0.5,
            "q": Linear.init(ks[7], cfg.t5_dim, cfg.t5_dim),
            "k": Linear.init(ks[8], cfg.t5_dim, cfg.t5_dim),
            "v": Linear.init(ks[9], cfg.t5_dim, cfg.t5_dim),
            "out": Linear.init(ks[10], cfg.t5_dim, cfg.pooled_dim),
        },
        **({"style_embedder": jax.random.normal(
            jax.random.fold_in(ks[11], 1), (cfg.style_classes, 128),
            jnp.float32) * 0.02} if cfg.use_style_meta else {}),
        "extra_embedder": {
            "in_layer": Linear.init(jax.random.fold_in(ks[11], 2),
                                    pooled_in, h * 4),
            "out_layer": Linear.init(jax.random.fold_in(ks[11], 3), h * 4, h),
        },
        "blocks": _stack_init(jax.random.fold_in(ks[11], 4), cfg.n_pre, cfg,
                              skip=False),
        "skip_blocks": _stack_init(jax.random.fold_in(ks[11], 5), cfg.n_skip,
                                   cfg, skip=True),
        "norm_out": {        # AdaLayerNormContinuous (no elementwise affine)
            "linear": Linear.init(jax.random.fold_in(ks[11], 6), h, 2 * h),
        },
        "proj_out": Linear.init(jax.random.fold_in(ks[11], 7), h,
                                cfg.patch_size ** 2 * cfg.out_channels),
    }


# ---------------------------------------------------------------------------
# rotary
# ---------------------------------------------------------------------------
def rope_2d(head_dim: int, gh: int, gw: int):
    """Axial 2D rotary tables (cos, sin), each [gh*gw, head_dim].

    diffusers get_2d_rotary_pos_embed: half the head dims rotate with the
    row coordinate, half with the column, interleaved-pair convention
    (adjacent (even, odd) channels form a rotation pair)."""
    def axis(dim, pos):
        freqs = 1.0 / (10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        ang = jnp.outer(pos, freqs)                      # [n, dim/2]
        return (jnp.repeat(jnp.cos(ang), 2, axis=-1),
                jnp.repeat(jnp.sin(ang), 2, axis=-1))    # [n, dim]

    hcos, hsin = axis(head_dim // 2, jnp.arange(gh, dtype=jnp.float32))
    wcos, wsin = axis(head_dim // 2, jnp.arange(gw, dtype=jnp.float32))
    cos = jnp.concatenate([jnp.repeat(hcos, gw, axis=0),
                           jnp.tile(wcos, (gh, 1))], axis=-1)
    sin = jnp.concatenate([jnp.repeat(hsin, gw, axis=0),
                           jnp.tile(wsin, (gh, 1))], axis=-1)
    return cos, sin


def _apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """x [B, H, S, D]; interleaved pairs: (x0, x1) → (x0 c − x1 s, x1 c + x0 s)."""
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    c = cos.astype(x.dtype)[None, None]
    s = sin.astype(x.dtype)[None, None]
    return x * c + rot * s


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------
def _head_ln(x: Array, scale: Array, bias: Array) -> Array:
    return layer_norm(x, scale, bias, eps=1e-6)


def _self_attn(p, x, cos, sin, num_heads, pag_flag):
    q = split_heads(Linear.apply(p["q"], x), num_heads)
    k = split_heads(Linear.apply(p["k"], x), num_heads)
    v = split_heads(Linear.apply(p["v"], x), num_heads)
    q = _head_ln(q, p["q_norm_scale"], p["q_norm_bias"])
    k = _head_ln(k, p["k_norm_scale"], p["k_norm_bias"])
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    out = merge_heads(attention(q, k, v))
    # PAG perturbed branch: identity attention map → output is V itself
    out = jnp.where(pag_flag, merge_heads(v), out)
    return Linear.apply(p["out"], out)


def _cross_attn(p, x, ctx, cos, sin, num_heads):
    q = split_heads(Linear.apply(p["q"], x), num_heads)
    k = split_heads(Linear.apply(p["k"], ctx), num_heads)
    v = split_heads(Linear.apply(p["v"], ctx), num_heads)
    q = _head_ln(q, p["q_norm_scale"], p["q_norm_bias"])
    k = _head_ln(k, p["k_norm_scale"], p["k_norm_bias"])
    q = _apply_rope(q, cos, sin)   # rotary on image queries only
    return Linear.apply(p["out"], merge_heads(attention(q, k, v)))


def _block(p, x, ctx, temb, cos, sin, cfg: HunyuanDiTConfig, pag_flag,
           skip: Optional[Array] = None):
    if skip is not None:
        cat = jnp.concatenate([x, skip], axis=-1)
        cat = layer_norm(cat, p["skip_norm_scale"], p["skip_norm_bias"])
        x = Linear.apply(p["skip_linear"], cat)
    shift = Linear.apply(p["norm1_linear"], silu(temb))[:, None]
    h = layer_norm(x, p["norm1_scale"], p["norm1_bias"]) + shift
    x = x + _self_attn(p["attn1"], h, cos, sin, cfg.num_heads, pag_flag)
    h = layer_norm(x, p["norm2_scale"], p["norm2_bias"])
    x = x + _cross_attn(p["attn2"], h, ctx, cos, sin, cfg.num_heads)
    h = layer_norm(x, p["norm3_scale"], p["norm3_bias"])
    x = x + Linear.apply(p["mlp_out"], gelu_tanh(Linear.apply(p["mlp_in"], h)))
    return x


def _attention_pool(p, t5: Array) -> Array:
    """CLIP-style attention pool over the T5 stream → [B, pooled_dim]."""
    x = t5.astype(jnp.float32)
    mean = x.mean(axis=1, keepdims=True)
    x = jnp.concatenate([mean, x], axis=1) + p["pos"][None]
    q = Linear.apply(p["q"], x[:, :1])
    k = Linear.apply(p["k"], x)
    v = Linear.apply(p["v"], x)
    nh = 8
    q, k, v = (split_heads(a, nh) for a in (q, k, v))
    pooled = merge_heads(attention(q, k, v))[:, 0]
    return Linear.apply(p["out"], pooled)


def build_context(params, cfg: HunyuanDiTConfig, clip_states: Array,
                  clip_mask: Array, t5_states: Array, t5_mask: Array):
    """Joint text context [B, 77+256, text_dim] with learned padding rows
    (diffusers HunyuanDiT2DModel.forward text handling) + pooled T5."""
    t5_proj = Linear.apply(params["text_embedder"]["fc2"], silu(
        Linear.apply(params["text_embedder"]["fc1"],
                     t5_states.astype(jnp.float32))))
    ctx = jnp.concatenate([clip_states.astype(jnp.float32), t5_proj], axis=1)
    mask = jnp.concatenate([clip_mask, t5_mask], axis=1)[..., None]
    pad = params["text_embedding_padding"][None]
    ctx = jnp.where(mask > 0, ctx, pad)
    pooled = _attention_pool(params["pooler"], t5_states)
    return ctx, pooled


def apply(params, cfg: HunyuanDiTConfig, x: Array, t: Array, ctx: Array,
          pooled: Array, image_meta_size: Optional[Array] = None,
          style: Optional[Array] = None, pag: bool = False) -> Array:
    """One denoise step.

    x: [B, H, W, C] latents (NHWC); t: [B] integer timesteps;
    ctx: [B, 333, text_dim] joint text context (build_context);
    pooled: [B, pooled_dim]; image_meta_size: [B, 6]; style: [B] int.
    pag: run the perturbed-attention branch (identity self-attention in
    cfg.pag_layers). Returns [B, H, W, out_channels].
    """
    b, hh, ww, c = x.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    # patchify → tokens [B, gh*gw, p*p*c]
    xt = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    xt = xt.reshape(b, gh * gw, p * p * c)
    h = Linear.apply(params["patch_embed"], xt)

    # integer DDPM timesteps: no [0,1]→1000 rescale (time_factor=1); the
    # cos|sin layout matches diffusers Timesteps(flip_sin_to_cos=True)
    temb = Linear.apply(params["timestep_embedder"]["out_layer"], silu(
        Linear.apply(params["timestep_embedder"]["in_layer"],
                     timestep_embedding(t, 256, time_factor=1.0).astype(h.dtype))))
    if cfg.use_style_meta:
        meta = (image_meta_size if image_meta_size is not None
                else jnp.zeros((b, cfg.meta_dims), jnp.float32))
        meta_emb = timestep_embedding(meta.reshape(-1), 256,
                                      time_factor=1.0).reshape(
            b, cfg.meta_dims * 256)
        style_idx = style if style is not None else jnp.zeros((b,), jnp.int32)
        style_emb = params["style_embedder"][style_idx]
        extra = jnp.concatenate(
            [pooled.astype(jnp.float32), meta_emb, style_emb],
            axis=-1).astype(h.dtype)
    else:  # v1.1/v1.2: extra conditioning is the pooled text alone
        extra = pooled.astype(h.dtype)
    temb = temb + Linear.apply(params["extra_embedder"]["out_layer"], silu(
        Linear.apply(params["extra_embedder"]["in_layer"], extra)))

    cos, sin = rope_2d(cfg.head_dim, gh, gw)
    ctx = ctx.astype(h.dtype)

    pag_pre = jnp.array([pag and (i in cfg.pag_layers)
                         for i in range(cfg.n_pre)])
    pag_skip = jnp.array([pag and (i + cfg.n_pre in cfg.pag_layers)
                          for i in range(cfg.n_skip)])

    def pre(carry, xs):
        blk, flag = xs
        out = _block(blk, carry, ctx, temb, cos, sin, cfg, flag)
        return out, out

    h, stack = jax.lax.scan(pre, h, (params["blocks"], pag_pre))
    # layers 0..n_pre-3 feed the skip stack in reverse (diffusers pushes for
    # layer < depth//2 - 1 and pops for layer > depth//2)
    skips = stack[: cfg.n_pre - 2][::-1]

    def post(carry, xs):
        blk, flag, skip = xs
        out = _block(blk, carry, ctx, temb, cos, sin, cfg, flag, skip=skip)
        return out, None

    h, _ = jax.lax.scan(post, h, (params["skip_blocks"], pag_skip, skips))

    # diffusers AdaLayerNormContinuous chunk order: (scale, shift)
    sh_sc = Linear.apply(params["norm_out"]["linear"], silu(temb))
    scale, shift = jnp.split(sh_sc, 2, axis=-1)
    h = (1.0 + scale[:, None]) * layer_norm(h) + shift[:, None]
    out = Linear.apply(params["proj_out"], h)
    out = out.reshape(b, gh, gw, p, p, cfg.out_channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.out_channels)
    return out
