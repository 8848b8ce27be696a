"""HunyuanPaint 2.5D UNet (multiview diffusion denoiser), TPU-native NHWC.

Behavioral parity: reference hy3dgen/texgen/hunyuanpaint/unet/modules.py —
UNet2p5DConditionModel :404 wrapping a diffusers SD2.1-class
UNet2DConditionModel with:
  * 12-channel conv_in (gen latent + normal + position latents, :437-445),
  * learned text embeddings (learned_text_clip_gen/ref [1,77,1024], :448),
  * camera-index class embedding added to the time embedding (:450-456),
  * every BasicTransformerBlock replaced by Basic2p5DTransformerBlock (:46)
    adding reference attention (kv from the ref branch's norm1 states cached
    per layer, :183-204) and multiview attention (self-attn over all views'
    tokens concatenated, :207-237),
  * dual-stream: a separate UNet copy runs the reference image at t=0 in
    'w' (write) mode to fill the cache (:546-560).

TPU-first: NHWC convs, fp32 GroupNorm/softmax, bf16 matmuls; views are folded
into the batch axis (dp-shardable); the layer cache is an explicit pytree
(pure function in 'w' mode returns it; 'r' mode consumes it) so the full
denoise step jits cleanly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.attention import attention as attn_op
from hunyuan3d2_tpu.ops.attention import merge_heads, split_heads
from hunyuan3d2_tpu.ops.conv import Conv2d, ResnetBlock, group_norm, init_group_norm, upsample_nearest2x
from hunyuan3d2_tpu.ops.nn import Linear, layer_norm, silu

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class PaintUNetConfig:
    in_channels: int = 12
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64
    norm_num_groups: int = 32
    num_class_embeds: int = 5 + 12 * 3 + 4 * 2   # max_num_ref + max_num_gen
    use_multiview_attention: bool = True
    use_reference_attention: bool = True
    use_camera_embedding: bool = True
    use_dual_stream: bool = True
    # SD2.1-class UNets fix the HEAD SIZE (attention_head_dim channels per
    # head); SD1.5-class UNets (e.g. the InstructPix2Pix delight model) fix
    # the HEAD COUNT at 8 with per-block head sizes — set num_heads for those
    num_heads: Optional[int] = None
    # per-down-block cross-attention flags (up blocks mirror the reversed
    # pattern, as in diffusers up_block_types). None → the SD/paint default
    # (attention everywhere except the deepest down / shallowest up block).
    # The x4 upscaler uses (False, True, True, True).
    down_cross: Optional[tuple] = None
    # "table": learned class-embedding rows (camera indices, diffusers
    # num_class_embeds); "timestep": the class label is sinusoid-embedded and
    # MLP-projected like the timestep (diffusers class_embed_type='timestep',
    # the x4 upscaler's low-res noise_level conditioning)
    class_embed_type: str = "table"

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def is_cross(self, i: int, down: bool) -> bool:
        """down blocks: CrossAttn,CrossAttn,CrossAttn,Down; up mirrors.
        An explicit ``down_cross`` tuple overrides (up blocks reversed)."""
        n = len(self.block_out_channels)
        if self.down_cross is not None:
            return self.down_cross[i if down else n - 1 - i]
        return (i < n - 1) if down else (i > 0)


DEFAULT = PaintUNetConfig()
TINY = PaintUNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                       cross_attention_dim=32, attention_head_dim=8,
                       norm_num_groups=8)


def compute_voxel_grid_mask(position: Array, grid_resolution: int) -> Array:
    """Voxel-locality multiview attention mask (parity: unet/modules.py
    compute_voxel_grid_mask :302-345): pool the per-view position maps to
    grid_resolution², average the 3D position over valid (non-background)
    pixels, and allow attention only between token pairs whose 3D positions
    are within 1.73/grid_resolution.

    position: [B, N, H, W, 3] in [0,1] (1 ⇒ background). → bool
    [B, N·g², N·g²]."""
    b, n, h, w, _ = position.shape
    g = grid_resolution
    valid = (position != 1.0).all(axis=-1, keepdims=True)
    pos = jnp.where(valid, position, 0.0)
    ph, pw = h // g, w // g
    pos = pos.reshape(b, n, g, ph, g, pw, 3).sum(axis=(3, 5))
    cnt = valid.astype(jnp.float32).reshape(b, n, g, ph, g, pw, 1).sum(axis=(3, 5))
    grid_pos = pos / jnp.maximum(cnt, 1.0)
    grid_pos = jnp.where(cnt < 5, 0.0, grid_pos)                 # [B,N,g,g,3]
    flat = grid_pos.reshape(b, n * g * g, 3)
    # |a-b|² = |a|² + |b|² - 2a·b as a matmul: avoids the [B,L,L,3]
    # broadcast temporary (453 MB at g=32, N=6) — peak HBM matters when the
    # full paint stack is resident
    sq = jnp.sum(flat * flat, axis=-1)
    d2 = (sq[:, :, None] + sq[:, None, :]
          - 2.0 * jnp.einsum("bld,bmd->blm", flat, flat))
    return d2 < (1.73 / g) ** 2


def compute_multi_resolution_mask(position_maps: Array,
                                  grid_resolutions=(32, 16, 8)) -> dict:
    """Parity: modules.py compute_multi_resolution_mask :349-356. Returns
    {token_count: [B, L, L] bool} keyed by the multiview sequence length."""
    masks = {}
    for g in grid_resolutions:
        m = compute_voxel_grid_mask(position_maps, g)
        masks[m.shape[1]] = m
    return masks


def compute_discrete_voxel_indice(position: Array, grid_resolution: int = 8,
                                  voxel_resolution: int = 128) -> Array:
    """Quantized voxel indices per pooled grid cell (parity: unet/modules.py
    compute_discrete_voxel_indice :358-388): same valid-pixel pooling as the
    mask, then round the mean position onto a voxel_resolution³ lattice.

    position: [B, N, H, W, 3] in [0,1] (1 ⇒ background). → int32
    [B, N, g, g, 3]. The reference plumbs these through cross_attention_kwargs
    to the multiview Attention call (modules.py:215-224) where a stock
    processor ignores them — the voxel-locality masking actually in effect is
    the boolean mask path (compute_multi_resolution_mask); we keep index
    computation for checkpoint-config completeness.

    Pooling runs in float16 like the reference (it casts to .half() up
    front): the quantized indices are bit-compared in the parity test, and
    fp32 pooling flips ~3% of cells across the round-to-lattice boundary."""
    b, n, h, w, _ = position.shape
    g = grid_resolution
    position = position.astype(jnp.float16)
    valid = (position != 1.0).all(axis=-1, keepdims=True)
    pos = jnp.where(valid, position, jnp.float16(0.0))
    ph, pw = h // g, w // g
    pos = pos.reshape(b, n, g, ph, g, pw, 3).sum(axis=(3, 5))
    cnt = valid.astype(jnp.float16).reshape(b, n, g, ph, g, pw, 1).sum(axis=(3, 5))
    grid_pos = pos / jnp.maximum(cnt, jnp.float16(1.0))
    grid_pos = jnp.where(cnt < 5, jnp.float16(0.0), grid_pos)   # [B,N,g,g,3]
    grid_pos = jnp.clip(grid_pos, 0.0, 1.0)
    return jnp.round(grid_pos * jnp.float16(voxel_resolution - 1)
                     ).astype(jnp.int32)


def compute_multi_resolution_discrete_voxel_indice(
        position_maps: Array, grid_resolutions=(64, 32, 16, 8),
        voxel_resolutions=(512, 256, 128, 64)) -> dict:
    """Parity: modules.py compute_multi_resolution_discrete_voxel_indice
    :390-402. Returns {token_count: {'voxel_indices': [B, N·g², 3] int32,
    'voxel_resolution': int}} keyed by multiview sequence length."""
    out = {}
    for g, vr in zip(grid_resolutions, voxel_resolutions):
        idx = compute_discrete_voxel_indice(position_maps, g, vr)
        b, n = idx.shape[:2]
        flat = idx.reshape(b, n * g * g, 3)
        out[flat.shape[1]] = {"voxel_indices": flat, "voxel_resolution": vr}
    return out


def sd_timestep_embedding(t: Array, dim: int, max_period: float = 10000.0) -> Array:
    """diffusers Timesteps with flip_sin_to_cos=True, shift=0: [cos|sin]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def _init_attn(key, dim: int, kv_dim: Optional[int] = None):
    kv_dim = kv_dim or dim
    ks = jax.random.split(key, 4)
    return {
        "to_q": Linear.init(ks[0], dim, dim, bias=False),
        "to_k": Linear.init(ks[1], kv_dim, dim, bias=False),
        "to_v": Linear.init(ks[2], kv_dim, dim, bias=False),
        "to_out": Linear.init(ks[3], dim, dim),
    }


def _init_tblock(key, cfg: PaintUNetConfig, dim: int):
    ks = jax.random.split(key, 8)
    p = {
        "norm1": {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)},
        "attn1": _init_attn(ks[0], dim),
        "norm2": {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)},
        "attn2": _init_attn(ks[1], dim, cfg.cross_attention_dim),
        "norm3": {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)},
        "ff_in": Linear.init(ks[2], dim, 8 * dim),     # GEGLU: 2×4×dim
        "ff_out": Linear.init(ks[3], 4 * dim, dim),
    }
    if cfg.use_reference_attention:
        p["attn_refview"] = _init_attn(ks[4], dim)
    if cfg.use_multiview_attention:
        p["attn_multiview"] = _init_attn(ks[5], dim)
    return p


def _init_transformer2d(key, cfg: PaintUNetConfig, ch: int):
    ks = jax.random.split(key, 3)
    return {
        "norm": init_group_norm(ch),
        "proj_in": Linear.init(ks[0], ch, ch),
        "block": _init_tblock(ks[1], cfg, ch),
        "proj_out": Linear.init(ks[2], ch, ch),
    }


def init(key, cfg: PaintUNetConfig = DEFAULT, dual: bool = None):
    """Init UNet params. With dual (default cfg.use_dual_stream), includes a
    separate `dual` copy used for the reference 'w' pass."""
    chs = cfg.block_out_channels
    n = len(chs)
    ks = iter(jax.random.split(key, 512))

    def nk():
        return next(ks)

    p = {
        "conv_in": Conv2d.init(nk(), cfg.in_channels, chs[0], 3),
        "time_mlp_in": Linear.init(nk(), chs[0], cfg.time_embed_dim),
        "time_mlp_out": Linear.init(nk(), cfg.time_embed_dim, cfg.time_embed_dim),
        "learned_text_clip_gen": jax.random.normal(nk(), (1, 77, cfg.cross_attention_dim), jnp.float32),
        "learned_text_clip_ref": jax.random.normal(nk(), (1, 77, cfg.cross_attention_dim), jnp.float32),
        "down": [],
        "up": [],
    }
    if cfg.use_camera_embedding:
        if cfg.class_embed_type == "timestep":
            p["class_mlp_in"] = Linear.init(nk(), chs[0], cfg.time_embed_dim)
            p["class_mlp_out"] = Linear.init(nk(), cfg.time_embed_dim,
                                             cfg.time_embed_dim)
        else:
            p["class_embedding"] = jax.random.normal(
                nk(), (cfg.num_class_embeds, cfg.time_embed_dim),
                jnp.float32) * 0.02

    c_in = chs[0]
    for i, c_out in enumerate(chs):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(ResnetBlock.init(nk(), c_in if j == 0 else c_out,
                                                   c_out, cfg.time_embed_dim))
            if cfg.is_cross(i, down=True):
                blk["attns"].append(_init_transformer2d(nk(), cfg, c_out))
        if i < n - 1:
            blk["downsample"] = Conv2d.init(nk(), c_out, c_out, 3)
        p["down"].append(blk)
        c_in = c_out

    p["mid"] = {
        "res1": ResnetBlock.init(nk(), chs[-1], chs[-1], cfg.time_embed_dim),
        "attn": _init_transformer2d(nk(), cfg, chs[-1]),
        "res2": ResnetBlock.init(nk(), chs[-1], chs[-1], cfg.time_embed_dim),
    }

    rev = list(reversed(chs))
    for i, c_out in enumerate(rev):
        prev = rev[max(i - 1, 0)]            # channels coming from below
        skip_src = rev[min(i + 1, n - 1)]    # channels of skip at deepest resnet
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block + 1):
            res_skip = prev if j == 0 else c_out
            skip_ch = c_out if j < cfg.layers_per_block else skip_src
            blk["resnets"].append(ResnetBlock.init(nk(), res_skip + skip_ch,
                                                   c_out, cfg.time_embed_dim))
            if cfg.is_cross(i, down=False):
                blk["attns"].append(_init_transformer2d(nk(), cfg, c_out))
        if i < n - 1:
            blk["upsample"] = Conv2d.init(nk(), c_out, c_out, 3)
        p["up"].append(blk)

    p["norm_out"] = init_group_norm(chs[0])
    p["conv_out"] = Conv2d.init(nk(), chs[0], cfg.out_channels, 3)

    if dual if dual is not None else cfg.use_dual_stream:
        # the reference deep-copies the UNet BEFORE the 12-channel conv_in
        # swap (modules.py:415-419,437): the dual/ref branch keeps the
        # original 4-channel conv_in and has no extra 2.5D attentions.
        p["dual"] = init(nk(), dual_config(cfg), dual=False)
    return p


def dual_config(cfg: PaintUNetConfig) -> PaintUNetConfig:
    # the dual copy predates conv_in/camera-embedding surgery in the
    # reference (modules.py:415-419 deepcopy before init_condition/
    # init_camera_embedding) → 4-ch conv_in, no class embedding, no 2.5D attn
    return dataclasses.replace(cfg, in_channels=4,
                               use_multiview_attention=False,
                               use_reference_attention=False,
                               use_camera_embedding=False,
                               use_dual_stream=False)


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------
def _attention(p, x: Array, kv: Array, heads: int, mask: Array = None) -> Array:
    q = split_heads(Linear.apply(p["to_q"], x), heads)
    k = split_heads(Linear.apply(p["to_k"], kv), heads)
    v = split_heads(Linear.apply(p["to_v"], kv), heads)
    if mask is not None:
        from hunyuan3d2_tpu.ops.attention import masked_attention

        out = masked_attention(q, k, v, mask)
    else:
        out = attn_op(q, k, v)
    return Linear.apply(p["to_out"], merge_heads(out))


def _tblock(p, cfg: PaintUNetConfig, x: Array, context: Array, layer: str,
            mode: str, num_views: int, cache: Dict[str, Array],
            ref_scale: float, mva_scale: float,
            mva_masks: dict = None, ip_context: Array = None,
            ip_scale: float = 1.0) -> Array:
    heads = cfg.num_heads or x.shape[-1] // cfg.attention_head_dim
    h = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], eps=1e-5)

    x = x + _attention(p["attn1"], h, h, heads)

    if mode == "w":
        bn, l, c = h.shape
        cache[layer] = h.reshape(bn // num_views, num_views * l, c)
    if mode == "r" and cfg.use_reference_attention:
        ref = cache[layer]                                    # [B, Nr·L, C]
        bn, l, c = h.shape
        b = ref.shape[0]
        ref_rep = jnp.repeat(ref, bn // b, axis=0)            # [(B·N), Nr·L, C]
        out = _attention(p["attn_refview"], h, ref_rep, heads)
        # scale in fp32, then PIN the residual stream dtype: ref_scale is a
        # concrete f32 array (CFG path is per-batch), and `x + f32 * bf16`
        # would promote x — and every downstream conv/attention — to f32
        # (half MXU rate, 2x HBM) for the rest of the UNet
        x = x + (jnp.asarray(ref_scale, jnp.float32)
                 * out.astype(jnp.float32)).astype(x.dtype)

    if num_views > 1 and cfg.use_multiview_attention and mode == "r":
        bn, l, c = h.shape
        mv = h.reshape(bn // num_views, num_views * l, c)
        # turbo voxel-locality mask for this sequence length, if provided
        mask = (mva_masks or {}).get(num_views * l)
        out = _attention(p["attn_multiview"], mv, mv, heads, mask=mask)
        x = x + (jnp.asarray(mva_scale, jnp.float32)
                 * out.reshape(bn, l, c).astype(jnp.float32)).astype(x.dtype)

    h = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], eps=1e-5)
    if ip_context is not None and "to_k_ip" in p["attn2"]:
        # IP-Adapter decoupled image cross-attention (diffusers
        # IPAdapterAttnProcessor): same query, separate K/V projections over
        # the image tokens; the scaled image branch is added to the text
        # branch BEFORE the shared to_out projection
        a = p["attn2"]
        q = split_heads(Linear.apply(a["to_q"], h), heads)
        k = split_heads(Linear.apply(a["to_k"], context), heads)
        v = split_heads(Linear.apply(a["to_v"], context), heads)
        out = attn_op(q, k, v)
        k_ip = split_heads(Linear.apply(a["to_k_ip"], ip_context), heads)
        v_ip = split_heads(Linear.apply(a["to_v_ip"], ip_context), heads)
        out = out + ip_scale * attn_op(q, k_ip, v_ip)
        x = x + Linear.apply(a["to_out"], merge_heads(out))
    else:
        x = x + _attention(p["attn2"], h, context, heads)

    h = layer_norm(x, p["norm3"]["scale"], p["norm3"]["bias"], eps=1e-5)
    ff = Linear.apply(p["ff_in"], h)
    a, b_ = jnp.split(ff, 2, axis=-1)
    x = x + Linear.apply(p["ff_out"], a * jax.nn.gelu(b_, approximate=False))
    return x


def _transformer2d(p, cfg: PaintUNetConfig, x: Array, context: Array, layer: str,
                   mode: str, num_views: int, cache, ref_scale, mva_scale,
                   mva_masks=None, ip_context=None, ip_scale=1.0) -> Array:
    b, hh, ww, c = x.shape
    res = x
    y = group_norm(x, p["norm"]["scale"], p["norm"]["bias"], cfg.norm_num_groups,
                   eps=1e-6)  # diffusers Transformer2DModel GroupNorm eps is 1e-6
    y = y.reshape(b, hh * ww, c)
    y = Linear.apply(p["proj_in"], y)
    y = _tblock(p["block"], cfg, y, context, layer, mode, num_views, cache,
                ref_scale, mva_scale, mva_masks, ip_context, ip_scale)
    y = Linear.apply(p["proj_out"], y)
    return res + y.reshape(b, hh, ww, c)


def unet_apply(params, cfg: PaintUNetConfig, sample: Array, t: Array,
               context: Array, class_labels: Optional[Array], mode: str,
               num_views: int, cache: Dict[str, Array],
               ref_scale: float = 1.0, mva_scale: float = 1.0,
               mva_masks: dict = None, ip_context: Array = None,
               ip_scale: float = 1.0, ctrl_down: list = None,
               ctrl_mid: Array = None) -> Array:
    """Core UNet2DConditionModel forward (+2.5D attentions).

    sample: [(B·N), H, W, C_in] NHWC; t: [(B·N)]; context: [(B·N), 77, D].
    ``cache`` is mutated in 'w' mode (python dict; keys static per config).

    ``ip_context``/``ip_scale``: IP-Adapter image tokens (added in attn2 when
    the params carry to_k_ip/to_v_ip). ``ctrl_down``/``ctrl_mid``: ControlNet
    residuals — ctrl_down matches the skip list (conv_in + every down-block
    output), ctrl_mid is added after the mid block (diffusers
    UNet2DConditionModel down_block_additional_residuals /
    mid_block_additional_residual).
    """
    g = cfg.norm_num_groups
    temb = sd_timestep_embedding(t, cfg.block_out_channels[0])
    temb = Linear.apply(params["time_mlp_out"],
                        silu(Linear.apply(params["time_mlp_in"],
                                          temb.astype(sample.dtype))))
    if cfg.use_camera_embedding and class_labels is not None:
        if cfg.class_embed_type == "timestep":
            cemb = sd_timestep_embedding(class_labels.astype(jnp.float32),
                                         cfg.block_out_channels[0])
            cemb = Linear.apply(params["class_mlp_out"],
                                silu(Linear.apply(params["class_mlp_in"],
                                                  cemb.astype(temb.dtype))))
            temb = temb + cemb
        else:
            temb = temb + params["class_embedding"][class_labels].astype(
                temb.dtype)

    x = Conv2d.apply(params["conv_in"], sample)
    residuals = [x]
    for i, blk in enumerate(params["down"]):
        for j, r in enumerate(blk["resnets"]):
            x = ResnetBlock.apply(r, x, temb, g, eps=1e-5)
            if blk["attns"]:
                x = _transformer2d(blk["attns"][j], cfg, x, context,
                                   f"down_{i}_{j}", mode, num_views, cache,
                                   ref_scale, mva_scale, mva_masks,
                                   ip_context, ip_scale)
            residuals.append(x)
        if "downsample" in blk:
            # diffusers UNet Downsample2D uses SYMMETRIC padding=1 (unlike
            # the VAE encoder's asymmetric (0,1,0,1) pad)
            x = Conv2d.apply(blk["downsample"], x, stride=2,
                             padding=((1, 1), (1, 1)))
            residuals.append(x)

    if ctrl_down is not None:
        residuals = [r + c for r, c in zip(residuals, ctrl_down)]

    x = ResnetBlock.apply(params["mid"]["res1"], x, temb, g, eps=1e-5)
    x = _transformer2d(params["mid"]["attn"], cfg, x, context, "mid_0",
                       mode, num_views, cache, ref_scale, mva_scale, mva_masks,
                       ip_context, ip_scale)
    x = ResnetBlock.apply(params["mid"]["res2"], x, temb, g, eps=1e-5)
    if ctrl_mid is not None:
        x = x + ctrl_mid

    for i, blk in enumerate(params["up"]):
        for j, r in enumerate(blk["resnets"]):
            skip = residuals.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock.apply(r, x, temb, g, eps=1e-5)
            if blk["attns"]:
                x = _transformer2d(blk["attns"][j], cfg, x, context,
                                   f"up_{i}_{j}", mode, num_views, cache,
                                   ref_scale, mva_scale, mva_masks,
                                   ip_context, ip_scale)
        if "upsample" in blk:
            x = upsample_nearest2x(x)
            x = Conv2d.apply(blk["upsample"], x)

    x = group_norm(x, params["norm_out"]["scale"], params["norm_out"]["bias"], g,
                   eps=1e-5)  # UNet2DConditionModel norm_eps
    x = Conv2d.apply(params["conv_out"], silu(x))
    return x


def apply(params, cfg: PaintUNetConfig, sample: Array, timestep: Array,
          normal_latents: Array, position_latents: Array, ref_latents: Array,
          camera_info_gen: Array, camera_info_ref: Array,
          cache: Optional[Dict[str, Array]] = None,
          ref_scale: float = 1.0, mva_scale: float = 1.0,
          mva_masks: dict = None):
    """Full 2.5D forward (parity: modules.py:498-599).

    sample:          [B, N_gen, H, W, 4] noisy gen-view latents (NHWC inner)
    normal/position: [B, N_gen, H, W, 4] control latents
    ref_latents:     [B, N_ref, h, w, 4]
    camera_info_*:   [B, N] int camera indices (gen offset by max_num_ref=5)
    Returns (noise_pred [B, N_gen, H, W, 4], cache).
    """
    b, n_gen = sample.shape[:2]
    n_ref = ref_latents.shape[1]

    x = jnp.concatenate([sample, normal_latents, position_latents], axis=-1)
    x = x.reshape((b * n_gen,) + x.shape[2:])

    ctx_gen = jnp.repeat(params["learned_text_clip_gen"].astype(x.dtype), b * n_gen, axis=0)

    if cache is None and cfg.use_reference_attention:
        cache = {}
        ref = ref_latents.reshape((b * n_ref,) + ref_latents.shape[2:])
        ctx_ref = jnp.repeat(params["learned_text_clip_ref"].astype(x.dtype), b * n_ref, axis=0)
        if cfg.use_dual_stream:
            dual_params, dual_cfg, ref_in = params["dual"], dual_config(cfg), ref
        else:
            # single-stream fallback: pad control channels with zeros
            dual_params, dual_cfg = params, cfg
            ref_in = jnp.concatenate([ref, jnp.zeros_like(ref), jnp.zeros_like(ref)], axis=-1)
        ref_labels = (camera_info_ref.reshape(-1)
                      if dual_cfg.use_camera_embedding else None)
        unet_apply(dual_params, dual_cfg, ref_in, jnp.zeros((b * n_ref,), jnp.float32),
                   ctx_ref, ref_labels, "w", n_ref, cache)

    t = jnp.broadcast_to(jnp.atleast_1d(timestep), (b * n_gen,))
    labels = None
    if cfg.use_camera_embedding:
        labels = (camera_info_gen + 5).reshape(-1)
    # ref_scale may be per-batch (CFG: [0, 1] — reference pipeline.py:343)
    rs = jnp.asarray(ref_scale, jnp.float32)
    if rs.ndim == 1:
        rs = jnp.repeat(rs, n_gen).reshape(-1, 1, 1)
    out = unet_apply(params, cfg, x, t, ctx_gen, labels, "r", n_gen, cache,
                     rs, mva_scale, mva_masks)
    return out.reshape(b, n_gen, *out.shape[1:]), cache


# ---------------------------------------------------------------------------
# analytic FLOPs (bench MFU accounting)
# ---------------------------------------------------------------------------
def flops(cfg: PaintUNetConfig, h: int, w: int, num_views: int = 6,
          num_ref: int = 1, batch: int = 1, mode: str = "r") -> float:
    """Analytic matmul/conv FLOPs for ONE ``unet_apply`` over
    ``batch * num_views`` samples at latent resolution (h, w).

    Mirrors the init()/unet_apply() walk exactly (same block loops, same
    resolution halving/doubling, same 2.5D attention placement), counting
    2·k²·c_in·c_out·pixels per conv and 4·T·S·d per attention — elementwise
    and normalization work (<1%) is excluded. Used by bench.py because JAX
    0.9's un-compiled ``lower().cost_analysis()`` returns None and a compiled
    cost analysis would require compiling the full-size UNet just for the
    metric. Validated against XLA's compiled cost model in
    tests/test_flops.py."""
    BN = batch * num_views
    ted = cfg.time_embed_dim

    def conv(cin, cout, k, pix):
        return 2.0 * k * k * cin * cout * pix * BN

    def lin(cin, cout, tokens_total):
        return 2.0 * cin * cout * tokens_total

    def res(cin, cout, pix):
        r = conv(cin, cout, 3, pix) + conv(cout, cout, 3, pix)
        r += lin(ted, cout, BN)                      # time_emb_proj
        if cin != cout:
            r += conv(cin, cout, 1, pix)
        return r

    def t2d(ch, hh, ww):
        T = hh * ww
        tt = T * BN
        x = 2 * lin(ch, ch, tt)                      # proj_in/proj_out
        x += 4 * lin(ch, ch, tt) + 4.0 * T * T * ch * BN          # attn1
        x += 2 * lin(ch, ch, tt)                     # attn2 q + out
        x += 2 * lin(cfg.cross_attention_dim, ch, 77 * BN)        # attn2 k,v
        x += 4.0 * T * 77 * ch * BN
        if mode == "r" and cfg.use_reference_attention:
            S = num_ref * T
            x += 2 * lin(ch, ch, tt) + 2 * lin(ch, ch, S * BN)
            x += 4.0 * T * S * ch * BN
        if mode == "r" and cfg.use_multiview_attention and num_views > 1:
            L = num_views * T
            x += 4 * lin(ch, ch, L * batch) + 4.0 * L * L * ch * batch
        x += lin(ch, 8 * ch, tt) + lin(4 * ch, ch, tt)            # GEGLU ff
        return x

    chs = cfg.block_out_channels
    n = len(chs)
    hh, ww = h, w
    f = conv(cfg.in_channels, chs[0], 3, hh * ww)
    f += lin(chs[0], ted, BN) + lin(ted, ted, BN)    # time MLP
    c_in = chs[0]
    for i, c_out in enumerate(chs):
        for j in range(cfg.layers_per_block):
            f += res(c_in if j == 0 else c_out, c_out, hh * ww)
            if cfg.is_cross(i, down=True):
                f += t2d(c_out, hh, ww)
        if i < n - 1:
            hh, ww = hh // 2, ww // 2
            f += conv(c_out, c_out, 3, hh * ww)      # stride-2 downsample
        c_in = c_out

    f += 2 * res(chs[-1], chs[-1], hh * ww) + t2d(chs[-1], hh, ww)

    rev = list(reversed(chs))
    for i, c_out in enumerate(rev):
        prev = rev[max(i - 1, 0)]
        skip_src = rev[min(i + 1, n - 1)]
        for j in range(cfg.layers_per_block + 1):
            res_skip = prev if j == 0 else c_out
            skip_ch = c_out if j < cfg.layers_per_block else skip_src
            f += res(res_skip + skip_ch, c_out, hh * ww)
            if cfg.is_cross(i, down=False):
                f += t2d(c_out, hh, ww)
        if i < n - 1:
            hh, ww = hh * 2, ww * 2
            f += conv(c_out, c_out, 3, hh * ww)      # post-upsample conv
    f += conv(chs[0], cfg.out_channels, 3, hh * ww)
    return f


def apply_flops(cfg: PaintUNetConfig, h: int, w: int, num_views: int = 6,
                num_ref: int = 1, batch: int = 1):
    """(per-step 'r' FLOPs, one-time 'w' cache-build FLOPs) for apply()."""
    r = flops(cfg, h, w, num_views, num_ref, batch, mode="r")
    b = 0.0
    if cfg.use_reference_attention:
        dcfg = dual_config(cfg) if cfg.use_dual_stream else cfg
        b = flops(dcfg, h, w, num_ref, num_ref, batch, mode="w")
    return r, b
