"""ControlNet for the SD-class UNets, TPU-native NHWC.

Behavioral parity: diffusers ControlNetModel as instantiated by the
reference's texture-alignment helpers (hy3dgen/texgen/utils/
alignImg4Tex_utils.py:22-28 — 'control_v11f1p_sd15_depth' on SD1.5 — and
:75-80 — SDXL depth ControlNet). Architecture: a copy of the UNet's conv_in
+ time embedding + down blocks + mid block, plus

  * a conditioning embedder (ControlNetConditioningEmbedding): a small conv
    stack that maps the [0,1] control image (depth map) at pixel resolution
    down 8× to the latent resolution, ending in a ZERO-initialized conv,
  * one zero-initialized 1×1 conv per skip residual (controlnet_down_blocks)
    and one for the mid output (controlnet_mid_block).

Zero convs make the net an exact identity at init: every emitted residual is
0, so UNet(sample, ctrl(…)) == UNet(sample) — the invariant the tests pin.

TPU-first: NHWC convs, bf16 matmuls / fp32 norms via the shared ops
primitives; the whole forward jits into the denoise scan alongside the UNet
(one compiled program per step — no per-step dispatch boundary like the
torch reference's separate controlnet(...) then unet(...) calls).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.models.paint_unet import (
    PaintUNetConfig,
    _init_transformer2d,
    _transformer2d,
    dual_config,
    sd_timestep_embedding,
)
from hunyuan3d2_tpu.ops.conv import Conv2d, ResnetBlock, init_group_norm
from hunyuan3d2_tpu.ops.nn import Linear, silu

Array = jax.Array

# SD1.5-class ControlNet (control_v11f1p_sd15_depth): 4-ch sample, 768 cross,
# 8 heads/block — the plain-UNet flags (no 2.5D attentions) via dual_config
SD15 = dataclasses.replace(
    dual_config(PaintUNetConfig()), cross_attention_dim=768, num_heads=8)
TINY = dataclasses.replace(
    dual_config(PaintUNetConfig(block_out_channels=(32, 64),
                                layers_per_block=1, cross_attention_dim=32,
                                attention_head_dim=8, norm_num_groups=8)),
    num_heads=2)

# diffusers ControlNetConditioningEmbedding default channel ladder
COND_CHANNELS = (16, 32, 96, 256)


def _zero_conv(in_ch: int, out_ch: int, kernel: int = 1):
    return {"w": jnp.zeros((kernel, kernel, in_ch, out_ch), jnp.float32),
            "b": jnp.zeros((out_ch,), jnp.float32)}


def init(key, cfg: PaintUNetConfig = SD15, cond_channels: int = 3):
    """Init ControlNet params (structure mirrors paint_unet.init's down/mid)."""
    chs = cfg.block_out_channels
    n = len(chs)
    ks = iter(jax.random.split(key, 512))

    def nk():
        return next(ks)

    p = {
        "conv_in": Conv2d.init(nk(), cfg.in_channels, chs[0], 3),
        "time_mlp_in": Linear.init(nk(), chs[0], cfg.time_embed_dim),
        "time_mlp_out": Linear.init(nk(), cfg.time_embed_dim,
                                    cfg.time_embed_dim),
        "down": [],
    }

    # conditioning embedder: conv_in → (conv, strided conv) ladder → zero out
    cond = {"conv_in": Conv2d.init(nk(), cond_channels, COND_CHANNELS[0], 3),
            "blocks": []}
    for i in range(len(COND_CHANNELS) - 1):
        cond["blocks"].append(
            Conv2d.init(nk(), COND_CHANNELS[i], COND_CHANNELS[i], 3))
        cond["blocks"].append(
            Conv2d.init(nk(), COND_CHANNELS[i], COND_CHANNELS[i + 1], 3))
    cond["conv_out"] = _zero_conv(COND_CHANNELS[-1], chs[0], kernel=3)
    p["cond_embed"] = cond

    zero_convs = [_zero_conv(chs[0], chs[0])]           # for the conv_in skip
    c_in = chs[0]
    for i, c_out in enumerate(chs):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(
                ResnetBlock.init(nk(), c_in if j == 0 else c_out, c_out,
                                 cfg.time_embed_dim))
            if cfg.is_cross(i, down=True):
                blk["attns"].append(_init_transformer2d(nk(), cfg, c_out))
            zero_convs.append(_zero_conv(c_out, c_out))
        if i < n - 1:
            blk["downsample"] = Conv2d.init(nk(), c_out, c_out, 3)
            zero_convs.append(_zero_conv(c_out, c_out))
        p["down"].append(blk)
        c_in = c_out

    p["mid"] = {
        "res1": ResnetBlock.init(nk(), chs[-1], chs[-1], cfg.time_embed_dim),
        "attn": _init_transformer2d(nk(), cfg, chs[-1]),
        "res2": ResnetBlock.init(nk(), chs[-1], chs[-1], cfg.time_embed_dim),
    }
    p["ctrl_down"] = zero_convs
    p["ctrl_mid"] = _zero_conv(chs[-1], chs[-1])
    return p


def cond_embed(p, cond_image: Array) -> Array:
    """[B, H, W, C] control image in [0,1] → [B, H/8, W/8, chs[0]]."""
    x = silu(Conv2d.apply(p["conv_in"], cond_image))
    for i, blk in enumerate(p["blocks"]):
        x = silu(Conv2d.apply(blk, x, stride=2 if i % 2 == 1 else 1,
                              padding=((1, 1), (1, 1)) if i % 2 == 1
                              else "SAME"))
    return Conv2d.apply(p["conv_out"], x)


def apply(params, cfg: PaintUNetConfig, sample: Array, t: Array,
          context: Array, cond_image: Array,
          conditioning_scale: float = 1.0,
          ip_context: Optional[Array] = None, ip_scale: float = 1.0):
    """ControlNet forward.

    sample: [B, h, w, 4] noisy latents (pre-scaled by the scheduler);
    t: [B]; context: [B, 77, D] text embeds; cond_image: [B, 8h, 8w, C]
    control image in [0,1]. Returns (down_residuals list, mid_residual) —
    feed straight into paint_unet.unet_apply(ctrl_down=…, ctrl_mid=…).
    """
    g = cfg.norm_num_groups
    temb = sd_timestep_embedding(t, cfg.block_out_channels[0])
    temb = Linear.apply(params["time_mlp_out"],
                        silu(Linear.apply(params["time_mlp_in"],
                                          temb.astype(sample.dtype))))

    x = Conv2d.apply(params["conv_in"], sample)
    x = x + cond_embed(params["cond_embed"],
                       cond_image.astype(sample.dtype)).astype(x.dtype)

    residuals = [x]
    for i, blk in enumerate(params["down"]):
        for j, r in enumerate(blk["resnets"]):
            x = ResnetBlock.apply(r, x, temb, g, eps=1e-5)
            if blk["attns"]:
                x = _transformer2d(blk["attns"][j], cfg, x, context,
                                   f"down_{i}_{j}", "r", 1, {}, 1.0, 1.0,
                                   None, ip_context, ip_scale)
            residuals.append(x)
        if "downsample" in blk:
            x = Conv2d.apply(blk["downsample"], x, stride=2,
                             padding=((1, 1), (1, 1)))
            residuals.append(x)

    x = ResnetBlock.apply(params["mid"]["res1"], x, temb, g, eps=1e-5)
    x = _transformer2d(params["mid"]["attn"], cfg, x, context, "mid_0",
                       "r", 1, {}, 1.0, 1.0, None, ip_context, ip_scale)
    x = ResnetBlock.apply(params["mid"]["res2"], x, temb, g, eps=1e-5)

    s = jnp.asarray(conditioning_scale, jnp.float32)
    down = [Conv2d.apply(zc, r) * s
            for zc, r in zip(params["ctrl_down"], residuals)]
    mid = Conv2d.apply(params["ctrl_mid"], x) * s
    return down, mid
