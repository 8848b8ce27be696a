"""Torch functional twins of the paint stack (SD VAE + 2.5D UNet).

These consume diffusers-NAMED state dicts directly (the same dicts our
io/diffusers_maps.py ingests), implementing the reference semantics:

  * AutoencoderKL encoder/decoder — diffusers ResnetBlock2D (eps 1e-6),
    asymmetric (0,1,0,1) downsample pad, nearest-2x upsample, single-head
    mid attention.
  * UNet2DConditionModel + Basic2p5DTransformerBlock — reference
    hy3dgen/texgen/hunyuanpaint/unet/modules.py:46-237 (self-attn → ref-attn
    against cached 'w'-mode norm states → multiview attn over concatenated
    views → text cross-attn → GEGLU ff) and :498-599 (dual-stream ref branch
    at t=0), with diffusers conventions: symmetric downsample pad 1, GN eps
    1e-5 (resnets/out) and 1e-6 (Transformer2DModel), flip_sin_to_cos
    timestep embedding, head size 64 (SD2.1 lineage).

Pure functions over (state_dict, config) — no nn.Module state, so there is
no risk of the twin silently diverging from the named weights.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def timesteps_embed(ts, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = ts[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def gn(x, sd, p, groups, eps):
    return F.group_norm(x, groups, t(sd[p + ".weight"]), t(sd[p + ".bias"]), eps)


def conv(x, sd, p, stride=1, pad=1):
    return F.conv2d(x, t(sd[p + ".weight"]), t(sd[p + ".bias"]), stride, pad)


def lin(x, sd, p):
    b = t(sd[p + ".bias"]) if p + ".bias" in sd else None
    return F.linear(x, t(sd[p + ".weight"]), b)


def ln(x, sd, p, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), t(sd[p + ".weight"]),
                        t(sd[p + ".bias"]), eps)


def attn(x, kv, sd, p, heads):
    q, k, v = lin(x, sd, p + ".to_q"), lin(kv, sd, p + ".to_k"), lin(kv, sd, p + ".to_v")

    def split(a):
        b_, l, c = a.shape
        return a.view(b_, l, heads, c // heads).transpose(1, 2)

    o = F.scaled_dot_product_attention(split(q), split(k), split(v))
    o = o.transpose(1, 2).reshape(x.shape[0], x.shape[1], -1)
    return lin(o, sd, p + ".to_out.0")


def resnet(x, temb, sd, p, groups=32, eps=1e-5):
    h = conv(F.silu(gn(x, sd, p + ".norm1", groups, eps)), sd, p + ".conv1")
    if temb is not None and p + ".time_emb_proj.weight" in sd:
        h = h + lin(F.silu(temb), sd, p + ".time_emb_proj")[:, :, None, None]
    h = conv(F.silu(gn(h, sd, p + ".norm2", groups, eps)), sd, p + ".conv2")
    if p + ".conv_shortcut.weight" in sd:
        x = conv(x, sd, p + ".conv_shortcut", pad=0)
    return x + h


# ---------------------------------------------------------------------------
# SD VAE
# ---------------------------------------------------------------------------
def vae_mid_attn(x, sd, p, groups):
    b, c, h, w = x.shape
    y = gn(x, sd, p + ".group_norm", groups, 1e-6)
    y = y.reshape(b, c, h * w).transpose(1, 2)
    q, k, v = lin(y, sd, p + ".to_q"), lin(y, sd, p + ".to_k"), lin(y, sd, p + ".to_v")
    o = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
    o = lin(o, sd, p + ".to_out.0")
    return x + o.transpose(1, 2).reshape(b, c, h, w)


def vae_encode(sd, cfg, x01):
    """x01: [B,H,W,3] torch in [-1,1] NHWC → latents mean [B,h,w,4] NHWC
    (scaled by scaling_factor, matching sd_vae.encode)."""
    g = cfg.norm_num_groups if hasattr(cfg, "norm_num_groups") else 32
    x = x01.permute(0, 3, 1, 2)
    h = conv(x, sd, "encoder.conv_in")
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            h = resnet(h, None, sd, f"encoder.down_blocks.{i}.resnets.{j}", g, 1e-6)
        ds = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if ds + ".weight" in sd:
            h = F.pad(h, (0, 1, 0, 1))       # VAE: asymmetric pad
            h = conv(h, sd, ds, stride=2, pad=0)
    h = resnet(h, None, sd, "encoder.mid_block.resnets.0", g, 1e-6)
    h = vae_mid_attn(h, sd, "encoder.mid_block.attentions.0", g)
    h = resnet(h, None, sd, "encoder.mid_block.resnets.1", g, 1e-6)
    h = conv(F.silu(gn(h, sd, "encoder.conv_norm_out", g, 1e-6)), sd,
             "encoder.conv_out")
    h = conv(h, sd, "quant_conv", pad=0)
    mean = h.chunk(2, dim=1)[0]
    return (mean * cfg.scaling_factor).permute(0, 2, 3, 1)


def vae_decode(sd, cfg, latents):
    """latents: [B,h,w,4] NHWC scaled → [B,H,W,3] NHWC in [-1,1]."""
    g = cfg.norm_num_groups if hasattr(cfg, "norm_num_groups") else 32
    z = (latents / cfg.scaling_factor).permute(0, 3, 1, 2)
    h = conv(z, sd, "post_quant_conv", pad=0)
    h = conv(h, sd, "decoder.conv_in")
    h = resnet(h, None, sd, "decoder.mid_block.resnets.0", g, 1e-6)
    h = vae_mid_attn(h, sd, "decoder.mid_block.attentions.0", g)
    h = resnet(h, None, sd, "decoder.mid_block.resnets.1", g, 1e-6)
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            h = resnet(h, None, sd, f"decoder.up_blocks.{i}.resnets.{j}", g, 1e-6)
        us = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if us + ".weight" in sd:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = conv(h, sd, us)
    h = conv(F.silu(gn(h, sd, "decoder.conv_norm_out", g, 1e-6)), sd,
             "decoder.conv_out")
    return h.permute(0, 2, 3, 1)


# ---------------------------------------------------------------------------
# 2.5D UNet
# ---------------------------------------------------------------------------
def t2d(x, context, sd, p, head_dim, groups, layer, mode, n, cache,
        ref_scale, mva_scale):
    b, c, hh, ww = x.shape
    heads = c // head_dim
    res = x
    y = gn(x, sd, p + ".norm", groups, 1e-6)
    y = y.reshape(b, c, hh * ww).transpose(1, 2)
    y = lin(y, sd, p + ".proj_in")
    pb = p + ".transformer_blocks.0"
    base = pb + ".transformer" if pb + ".transformer.norm1.weight" in sd else pb

    hn = ln(y, sd, base + ".norm1")
    y = y + attn(hn, hn, sd, base + ".attn1", heads)
    if mode == "w":
        bn, l, cc = hn.shape
        cache[layer] = hn.reshape(bn // n, n * l, cc)
    if mode == "r" and pb + ".attn_refview.to_q.weight" in sd:
        ref = cache[layer]
        bn = hn.shape[0]
        rep = bn // ref.shape[0]
        ref_rep = ref.unsqueeze(1).repeat(1, rep, 1, 1).flatten(0, 1)
        y = y + ref_scale * attn(hn, ref_rep, sd, pb + ".attn_refview", heads)
    if mode == "r" and n > 1 and pb + ".attn_multiview.to_q.weight" in sd:
        bn, l, cc = hn.shape
        mv = hn.reshape(bn // n, n * l, cc)
        o = attn(mv, mv, sd, pb + ".attn_multiview", heads)
        y = y + mva_scale * o.reshape(bn, l, cc)
    h2 = ln(y, sd, base + ".norm2")
    y = y + attn(h2, context, sd, base + ".attn2", heads)
    h3 = ln(y, sd, base + ".norm3")
    ff = lin(h3, sd, base + ".ff.net.0.proj")
    a, gate = ff.chunk(2, dim=-1)
    y = y + lin(a * F.gelu(gate), sd, base + ".ff.net.2")
    y = lin(y, sd, p + ".proj_out")
    return res + y.transpose(1, 2).reshape(b, c, hh, ww)


def unet_core(sd_full, prefix, cfg, sample, timestep, context, class_labels,
              mode, n, cache, ref_scale=1.0, mva_scale=1.0):
    """sample: [BN,H,W,Cin] NHWC torch. Returns [BN,H,W,Cout] NHWC."""
    sd = {k[len(prefix):]: v for k, v in sd_full.items() if k.startswith(prefix)}
    g = cfg.norm_num_groups
    hd = cfg.attention_head_dim
    x = sample.permute(0, 3, 1, 2)
    temb = timesteps_embed(timestep, cfg.block_out_channels[0])
    temb = lin(F.silu(lin(temb, sd, "time_embedding.linear_1")), sd,
               "time_embedding.linear_2")
    if class_labels is not None and "class_embedding.weight" in sd:
        temb = temb + t(sd["class_embedding.weight"])[class_labels]

    x = conv(x, sd, "conv_in")
    residuals = [x]
    nb = len(cfg.block_out_channels)
    for i in range(nb):
        for j in range(cfg.layers_per_block):
            x = resnet(x, temb, sd, f"down_blocks.{i}.resnets.{j}", g, 1e-5)
            ap = f"down_blocks.{i}.attentions.{j}"
            if ap + ".proj_in.weight" in sd:
                x = t2d(x, context, sd, ap, hd, g, f"down_{i}_{j}", mode, n,
                        cache, ref_scale, mva_scale)
            residuals.append(x)
        ds = f"down_blocks.{i}.downsamplers.0.conv"
        if ds + ".weight" in sd:
            x = conv(x, sd, ds, stride=2, pad=1)   # UNet: symmetric pad
            residuals.append(x)

    x = resnet(x, temb, sd, "mid_block.resnets.0", g, 1e-5)
    x = t2d(x, context, sd, "mid_block.attentions.0", hd, g, "mid_0", mode, n,
            cache, ref_scale, mva_scale)
    x = resnet(x, temb, sd, "mid_block.resnets.1", g, 1e-5)

    for i in range(nb):
        for j in range(cfg.layers_per_block + 1):
            x = torch.cat([x, residuals.pop()], dim=1)
            x = resnet(x, temb, sd, f"up_blocks.{i}.resnets.{j}", g, 1e-5)
            ap = f"up_blocks.{i}.attentions.{j}"
            if ap + ".proj_in.weight" in sd:
                x = t2d(x, context, sd, ap, hd, g, f"up_{i}_{j}", mode, n,
                        cache, ref_scale, mva_scale)
        us = f"up_blocks.{i}.upsamplers.0.conv"
        if us + ".weight" in sd:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = conv(x, sd, us)

    x = conv(F.silu(gn(x, sd, "conv_norm_out", g, 1e-5)), sd, "conv_out")
    return x.permute(0, 2, 3, 1)


def unet2p5d_forward(sd, cfg, dual_cfg, sample, timestep, normal_latents,
                     position_latents, ref_latents, camera_info_gen,
                     camera_info_ref):
    """Full 2.5D forward twin (reference modules.py:498-599 semantics,
    matching paint_unet.apply's NHWC contract):
    sample/normal/position [B,N,H,W,4], ref [B,Nr,h,w,4] torch fp32."""
    b, n_gen = sample.shape[:2]
    n_ref = ref_latents.shape[1]
    x = torch.cat([sample, normal_latents, position_latents], dim=-1)
    x = x.flatten(0, 1)
    ctx_gen = t(sd["unet.learned_text_clip_gen"]).repeat(b * n_gen, 1, 1)

    cache = {}
    ref = ref_latents.flatten(0, 1)
    ctx_ref = t(sd["unet.learned_text_clip_ref"]).repeat(b * n_ref, 1, 1)
    unet_core(sd, "unet_dual.", dual_cfg, ref,
              torch.zeros(b * n_ref), ctx_ref, None, "w", n_ref, cache)

    ts = torch.full((b * n_gen,), float(timestep))
    labels = (camera_info_gen + 5).reshape(-1)
    out = unet_core(sd, "unet.", cfg, x, ts, ctx_gen, labels, "r", n_gen, cache)
    return out.reshape(b, n_gen, *out.shape[1:])
