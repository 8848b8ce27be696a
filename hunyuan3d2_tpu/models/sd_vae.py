"""SD image VAE (AutoencoderKL), TPU-native NHWC.

Behavioral parity: the diffusers AutoencoderKL used by HunyuanPaint to encode
reference/control images and decode generated views (reference
hy3dgen/texgen/hunyuanpaint/pipeline.py:232-244, 302-315, 383-387; exact
architecture documented at project/image3d/vae.py:20-455): encoder with
block_out (128,256,512,512) ×2 resnets + mid attention → 2·4 latent moments;
decoder mirror; scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.conv import (
    Conv2d,
    ResnetBlock,
    attention_2d,
    group_norm,
    init_attention_2d,
    init_group_norm,
    upsample_nearest2x,
)
from hunyuan3d2_tpu.ops.nn import silu

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SDVAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


DEFAULT = SDVAEConfig()
TINY = SDVAEConfig(block_out_channels=(32, 32), layers_per_block=1)


def init(key, cfg: SDVAEConfig = DEFAULT):
    chs = cfg.block_out_channels
    ks = iter(jax.random.split(key, 256))

    def nk():
        return next(ks)

    enc = {"conv_in": Conv2d.init(nk(), cfg.in_channels, chs[0], 3), "down": []}
    c_in = chs[0]
    for i, c_out in enumerate(chs):
        blk = {"resnets": [ResnetBlock.init(nk(), c_in if j == 0 else c_out, c_out)
                           for j in range(cfg.layers_per_block)]}
        if i < len(chs) - 1:
            blk["downsample"] = Conv2d.init(nk(), c_out, c_out, 3)
        enc["down"].append(blk)
        c_in = c_out
    enc["mid"] = {
        "res1": ResnetBlock.init(nk(), c_in, c_in),
        "attn": init_attention_2d(nk(), c_in),
        "res2": ResnetBlock.init(nk(), c_in, c_in),
    }
    enc["norm_out"] = init_group_norm(c_in)
    enc["conv_out"] = Conv2d.init(nk(), c_in, 2 * cfg.latent_channels, 3)
    enc["quant_conv"] = Conv2d.init(nk(), 2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)

    dec = {"post_quant_conv": Conv2d.init(nk(), cfg.latent_channels,
                                          cfg.latent_channels, 1),
           "conv_in": Conv2d.init(nk(), cfg.latent_channels, chs[-1], 3)}
    dec["mid"] = {
        "res1": ResnetBlock.init(nk(), chs[-1], chs[-1]),
        "attn": init_attention_2d(nk(), chs[-1]),
        "res2": ResnetBlock.init(nk(), chs[-1], chs[-1]),
    }
    dec["up"] = []
    c_in = chs[-1]
    for i, c_out in enumerate(reversed(chs)):
        blk = {"resnets": [ResnetBlock.init(nk(), c_in if j == 0 else c_out, c_out)
                           for j in range(cfg.layers_per_block + 1)]}
        if i < len(chs) - 1:
            blk["upsample"] = Conv2d.init(nk(), c_out, c_out, 3)
        dec["up"].append(blk)
        c_in = c_out
    dec["norm_out"] = init_group_norm(c_in)
    dec["conv_out"] = Conv2d.init(nk(), c_in, cfg.in_channels, 3)
    return {"encoder": enc, "decoder": dec}


def encode_moments(params, cfg: SDVAEConfig, images: Array) -> Array:
    """images: [B,H,W,3] in [-1,1] → moments [B,h,w,2*latent] (mean|logvar)."""
    e = params["encoder"]
    g = cfg.norm_num_groups
    x = Conv2d.apply(e["conv_in"], images)
    for blk in e["down"]:
        for r in blk["resnets"]:
            x = ResnetBlock.apply(r, x, num_groups=g)
        if "downsample" in blk:
            # diffusers pads (0,1,0,1) then stride-2 VALID
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = Conv2d.apply(blk["downsample"], x, stride=2, padding="VALID")
    x = ResnetBlock.apply(e["mid"]["res1"], x, num_groups=g)
    x = attention_2d(e["mid"]["attn"], x, g)
    x = ResnetBlock.apply(e["mid"]["res2"], x, num_groups=g)
    x = group_norm(x, e["norm_out"]["scale"], e["norm_out"]["bias"], g)
    x = Conv2d.apply(e["conv_out"], silu(x))
    return Conv2d.apply(e["quant_conv"], x)


def encode(params, cfg: SDVAEConfig, images: Array, key=None,
           sample: bool = False) -> Array:
    """→ scaled latents [B,h,w,latent]. sample=False → mode (mean)."""
    moments = encode_moments(params, cfg, images)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if sample:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
    return mean * cfg.scaling_factor


def decode(params, cfg: SDVAEConfig, latents: Array) -> Array:
    """scaled latents → images [B,H,W,3] in [-1,1]."""
    d = params["decoder"]
    g = cfg.norm_num_groups
    x = latents / cfg.scaling_factor
    x = Conv2d.apply(d["post_quant_conv"], x)
    x = Conv2d.apply(d["conv_in"], x)
    x = ResnetBlock.apply(d["mid"]["res1"], x, num_groups=g)
    x = attention_2d(d["mid"]["attn"], x, g)
    x = ResnetBlock.apply(d["mid"]["res2"], x, num_groups=g)
    for blk in d["up"]:
        for r in blk["resnets"]:
            x = ResnetBlock.apply(r, x, num_groups=g)
        if "upsample" in blk:
            x = upsample_nearest2x(x)
            x = Conv2d.apply(blk["upsample"], x)
    x = group_norm(x, d["norm_out"]["scale"], d["norm_out"]["bias"], g)
    x = Conv2d.apply(d["conv_out"], silu(x))
    return x


def flops(cfg: SDVAEConfig, h: int, w: int, batch: int = 1,
          direction: str = "encode") -> float:
    """Analytic conv/attention FLOPs for one encode (h, w = IMAGE resolution)
    or decode (h, w = LATENT resolution). Mirrors the init() block walk;
    2·k²·c_in·c_out·pixels per conv, 4·T²·c for the single-head mid
    attention. Used by bench.py's MFU accounting (JAX 0.9 dropped
    un-compiled cost_analysis); validated in tests/test_flops.py."""
    chs = cfg.block_out_channels
    n = len(chs)

    def conv(cin, cout, k, pix):
        return 2.0 * k * k * cin * cout * pix * batch

    def res(cin, cout, pix):
        r = conv(cin, cout, 3, pix) + conv(cout, cout, 3, pix)
        if cin != cout:
            r += conv(cin, cout, 1, pix)
        return r

    def attn(c, pix):
        return 4 * conv(c, c, 1, pix) + 4.0 * pix * pix * c * batch

    if direction == "encode":
        pix = h * w
        f = conv(cfg.in_channels, chs[0], 3, pix)
        c_in = chs[0]
        for i, c_out in enumerate(chs):
            for j in range(cfg.layers_per_block):
                f += res(c_in if j == 0 else c_out, c_out, pix)
            if i < n - 1:
                pix //= 4
                f += conv(c_out, c_out, 3, pix)
            c_in = c_out
        f += 2 * res(c_in, c_in, pix) + attn(c_in, pix)
        f += conv(c_in, 2 * cfg.latent_channels, 3, pix)
        f += conv(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1, pix)
    else:
        pix = h * w
        f = conv(cfg.latent_channels, cfg.latent_channels, 1, pix)
        f += conv(cfg.latent_channels, chs[-1], 3, pix)
        f += 2 * res(chs[-1], chs[-1], pix) + attn(chs[-1], pix)
        c_in = chs[-1]
        for i, c_out in enumerate(reversed(chs)):
            for j in range(cfg.layers_per_block + 1):
                f += res(c_in if j == 0 else c_out, c_out, pix)
            if i < n - 1:
                pix *= 4
                f += conv(c_out, c_out, 3, pix)
            c_in = c_out
        f += conv(c_in, cfg.in_channels, 3, pix)
    return f
