"""Convolution / GroupNorm / resnet primitives for the UNet & VAE (NHWC).

TPU-first: NHWC layout (XLA's native conv layout on TPU), kernels stored HWIO,
GroupNorm in fp32. Parity targets are diffusers' ResnetBlock2D / GroupNorm /
Upsample2D / Downsample2D semantics as used by the HunyuanPaint UNet and the
SD AutoencoderKL (reference project/image3d/vae.py documents the exact VAE).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.nn import PARAM_DTYPE, silu

Array = jax.Array


class Conv2d:
    @staticmethod
    def init(key, in_ch: int, out_ch: int, kernel: int = 3, dtype=None):
        dtype = dtype or PARAM_DTYPE
        fan_in = in_ch * kernel * kernel
        bound = 1.0 / math.sqrt(fan_in)
        kw, kb = jax.random.split(key)
        return {
            "w": jax.random.uniform(kw, (kernel, kernel, in_ch, out_ch),
                                    jnp.float32, -bound, bound).astype(dtype),
            "b": jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound).astype(dtype),
        }

    @staticmethod
    def apply(p, x: Array, stride: int = 1, padding="SAME") -> Array:
        y = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype),
            window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y + p["b"].astype(jnp.float32)).astype(x.dtype)


def group_norm(x: Array, scale: Array, bias: Array, num_groups: int = 32,
               eps: float = 1e-6) -> Array:
    """GroupNorm over channel groups, NHWC, fp32 internals."""
    b, h, w, c = x.shape
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = x32.mean(axis=(1, 2, 4), keepdims=True)
    var = ((x32 - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def init_group_norm(c: int):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


class ResnetBlock:
    """diffusers ResnetBlock2D: GN→silu→conv → (+time proj) → GN→silu→conv,
    1×1 shortcut on channel change."""

    @staticmethod
    def init(key, in_ch: int, out_ch: int, temb_ch: int = 0):
        ks = jax.random.split(key, 4)
        p = {
            "norm1": init_group_norm(in_ch),
            "conv1": Conv2d.init(ks[0], in_ch, out_ch, 3),
            "norm2": init_group_norm(out_ch),
            "conv2": Conv2d.init(ks[1], out_ch, out_ch, 3),
        }
        if temb_ch:
            from hunyuan3d2_tpu.ops.nn import Linear

            p["time_emb_proj"] = Linear.init(ks[2], temb_ch, out_ch)
        if in_ch != out_ch:
            p["shortcut"] = Conv2d.init(ks[3], in_ch, out_ch, 1)
        return p

    @staticmethod
    def apply(p, x: Array, temb: Array = None, num_groups: int = 32,
              eps: float = 1e-6) -> Array:
        # eps: 1e-6 for the SD VAE, 1e-5 for UNet2DConditionModel (diffusers
        # norm_eps defaults per model family)
        from hunyuan3d2_tpu.ops.nn import Linear

        h = group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], num_groups, eps)
        h = Conv2d.apply(p["conv1"], silu(h))
        if temb is not None and "time_emb_proj" in p:
            t = Linear.apply(p["time_emb_proj"], silu(temb))
            h = h + t[:, None, None, :].astype(h.dtype)
        h = group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"], num_groups, eps)
        h = Conv2d.apply(p["conv2"], silu(h))
        if "shortcut" in p:
            x = Conv2d.apply(p["shortcut"], x)
        return x + h


def upsample_nearest2x(x: Array) -> Array:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def attention_2d(p, x: Array, num_groups: int = 32) -> Array:
    """Single-head (VAE-style) spatial self-attention block."""
    from hunyuan3d2_tpu.ops.nn import Linear

    b, h, w, c = x.shape
    y = group_norm(x, p["norm"]["scale"], p["norm"]["bias"], num_groups)
    y = y.reshape(b, h * w, c)
    q = Linear.apply(p["q"], y)
    k = Linear.apply(p["k"], y)
    v = Linear.apply(p["v"], y)
    logits = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32) * (c ** -0.5)
    attn = jax.nn.softmax(logits, axis=-1).astype(y.dtype)
    o = jnp.einsum("bqk,bkc->bqc", attn, v, preferred_element_type=jnp.float32)
    o = Linear.apply(p["out"], o.astype(y.dtype))
    return x + o.reshape(b, h, w, c)


def init_attention_2d(key, c: int):
    from hunyuan3d2_tpu.ops.nn import Linear

    ks = jax.random.split(key, 4)
    return {
        "norm": init_group_norm(c),
        "q": Linear.init(ks[0], c, c),
        "k": Linear.init(ks[1], c, c),
        "v": Linear.init(ks[2], c, c),
        "out": Linear.init(ks[3], c, c),
    }
