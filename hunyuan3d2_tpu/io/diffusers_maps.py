"""Diffusers-format checkpoint ingestion: AutoencoderKL + UNet2p5D.

Behavioral parity: the paint UNet loads diffusers ``config.json`` +
``diffusion_pytorch_model.bin`` (reference unet/modules.py:422-434), with the
2.5D wrapper's state dict prefixing the base UNet with ``unet.`` / the dual
copy with ``unet_dual.`` and the per-block extras living at
``...transformer_blocks.{t}.transformer.*`` (the wrapped BasicTransformerBlock)
and ``...transformer_blocks.{t}.attn_refview/attn_multiview.*``
(modules.py:46-100). The SD VAE loads a standard diffusers AutoencoderKL
state dict.

Layout conventions: torch Linear [out,in] → [in,out]; torch Conv2d
[O,I,kh,kw] → HWIO.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from hunyuan3d2_tpu.io.checkpoints import _resolve_dtype


def _lin(sd, prefix, dtype, bias=True):
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T).astype(dtype)}
    if bias and prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"].astype(dtype)
    return p


def _conv(sd, prefix, dtype):
    w = sd[prefix + ".weight"]
    return {"w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(dtype),
            "b": sd[prefix + ".bias"].astype(dtype)}


def _gn(sd, prefix):
    return {"scale": sd[prefix + ".weight"].astype(np.float32),
            "bias": sd[prefix + ".bias"].astype(np.float32)}


def _ln(sd, prefix):
    return {"scale": sd[prefix + ".weight"].astype(np.float32),
            "bias": sd[prefix + ".bias"].astype(np.float32)}


def _resnet(sd, prefix, dtype, temb=False):
    p = {
        "norm1": _gn(sd, f"{prefix}.norm1"),
        "conv1": _conv(sd, f"{prefix}.conv1", dtype),
        "norm2": _gn(sd, f"{prefix}.norm2"),
        "conv2": _conv(sd, f"{prefix}.conv2", dtype),
    }
    if temb and f"{prefix}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin(sd, f"{prefix}.time_emb_proj", dtype)
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, f"{prefix}.conv_shortcut", dtype)
    return p


def _vae_attn(sd, prefix, dtype):
    return {
        "norm": _gn(sd, f"{prefix}.group_norm"),
        "q": _lin(sd, f"{prefix}.to_q", dtype),
        "k": _lin(sd, f"{prefix}.to_k", dtype),
        "v": _lin(sd, f"{prefix}.to_v", dtype),
        "out": _lin(sd, f"{prefix}.to_out.0", dtype),
    }


def map_sd_vae(sd: Dict[str, np.ndarray], cfg, dtype="bf16") -> dict:
    """diffusers AutoencoderKL state dict → models/sd_vae.py param tree."""
    dtype = _resolve_dtype(dtype)
    n_blocks = len(cfg.block_out_channels)
    enc = {"conv_in": _conv(sd, "encoder.conv_in", dtype), "down": []}
    for i in range(n_blocks):
        blk = {"resnets": [
            _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", dtype)
            for j in range(cfg.layers_per_block)]}
        ds = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if ds + ".weight" in sd:
            blk["downsample"] = _conv(sd, ds, dtype)
        enc["down"].append(blk)
    enc["mid"] = {
        "res1": _resnet(sd, "encoder.mid_block.resnets.0", dtype),
        "attn": _vae_attn(sd, "encoder.mid_block.attentions.0", dtype),
        "res2": _resnet(sd, "encoder.mid_block.resnets.1", dtype),
    }
    enc["norm_out"] = _gn(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out", dtype)
    enc["quant_conv"] = _conv(sd, "quant_conv", dtype)

    dec = {"post_quant_conv": _conv(sd, "post_quant_conv", dtype),
           "conv_in": _conv(sd, "decoder.conv_in", dtype)}
    dec["mid"] = {
        "res1": _resnet(sd, "decoder.mid_block.resnets.0", dtype),
        "attn": _vae_attn(sd, "decoder.mid_block.attentions.0", dtype),
        "res2": _resnet(sd, "decoder.mid_block.resnets.1", dtype),
    }
    dec["up"] = []
    for i in range(n_blocks):
        blk = {"resnets": [
            _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", dtype)
            for j in range(cfg.layers_per_block + 1)]}
        us = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if us + ".weight" in sd:
            blk["upsample"] = _conv(sd, us, dtype)
        dec["up"].append(blk)
    dec["norm_out"] = _gn(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out", dtype)
    return {"encoder": enc, "decoder": dec}


def _attn(sd, prefix, dtype):
    return {
        "to_q": _lin(sd, f"{prefix}.to_q", dtype),
        "to_k": _lin(sd, f"{prefix}.to_k", dtype),
        "to_v": _lin(sd, f"{prefix}.to_v", dtype),
        "to_out": _lin(sd, f"{prefix}.to_out.0", dtype),
    }


def _tblock(sd, prefix, dtype, extras: bool):
    """One (possibly wrapped) transformer block. ``extras`` → the 2.5D
    attn_refview/attn_multiview live beside the wrapped base block."""
    base = f"{prefix}.transformer" if f"{prefix}.transformer.norm1.weight" in sd \
        else prefix
    p = {
        "norm1": _ln(sd, f"{base}.norm1"),
        "attn1": _attn(sd, f"{base}.attn1", dtype),
        "norm2": _ln(sd, f"{base}.norm2"),
        "attn2": _attn(sd, f"{base}.attn2", dtype),
        "norm3": _ln(sd, f"{base}.norm3"),
        "ff_in": _lin(sd, f"{base}.ff.net.0.proj", dtype),
        "ff_out": _lin(sd, f"{base}.ff.net.2", dtype),
    }
    if extras:
        if f"{prefix}.attn_refview.to_q.weight" in sd:
            p["attn_refview"] = _attn(sd, f"{prefix}.attn_refview", dtype)
        if f"{prefix}.attn_multiview.to_q.weight" in sd:
            p["attn_multiview"] = _attn(sd, f"{prefix}.attn_multiview", dtype)
    return p


def _transformer2d(sd, prefix, dtype, extras: bool):
    return {
        "norm": _gn(sd, f"{prefix}.norm"),
        "proj_in": _lin(sd, f"{prefix}.proj_in", dtype),
        "block": _tblock(sd, f"{prefix}.transformer_blocks.0", dtype, extras),
        "proj_out": _lin(sd, f"{prefix}.proj_out", dtype),
    }


def map_unet_core(sd: Dict[str, np.ndarray], cfg, dtype="bf16",
                  prefix: str = "unet.", extras: bool = True) -> dict:
    """diffusers UNet2DConditionModel (+2.5D extras) → paint_unet param tree."""
    dtype = _resolve_dtype(dtype)
    s = {kk[len(prefix):]: vv for kk, vv in sd.items()
         if kk.startswith(prefix)} if prefix else sd
    n = len(cfg.block_out_channels)
    p = {
        "conv_in": _conv(s, "conv_in", dtype),
        "time_mlp_in": _lin(s, "time_embedding.linear_1", dtype),
        "time_mlp_out": _lin(s, "time_embedding.linear_2", dtype),
        "down": [], "up": [],
    }
    if cfg.use_camera_embedding and "class_embedding.weight" in s:
        p["class_embedding"] = s["class_embedding.weight"].astype(np.float32)
    if cfg.use_camera_embedding and "class_embedding.linear_1.weight" in s:
        # diffusers class_embed_type='timestep': a TimestepEmbedding MLP
        p["class_mlp_in"] = _lin(s, "class_embedding.linear_1", dtype)
        p["class_mlp_out"] = _lin(s, "class_embedding.linear_2", dtype)
    if "learned_text_clip_gen" in s:
        p["learned_text_clip_gen"] = s["learned_text_clip_gen"].astype(np.float32)
        p["learned_text_clip_ref"] = s["learned_text_clip_ref"].astype(np.float32)

    for i in range(n):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(
                _resnet(s, f"down_blocks.{i}.resnets.{j}", dtype, temb=True))
            if f"down_blocks.{i}.attentions.{j}.proj_in.weight" in s:
                blk["attns"].append(_transformer2d(
                    s, f"down_blocks.{i}.attentions.{j}", dtype, extras))
        ds = f"down_blocks.{i}.downsamplers.0.conv"
        if ds + ".weight" in s:
            blk["downsample"] = _conv(s, ds, dtype)
        p["down"].append(blk)

    p["mid"] = {
        "res1": _resnet(s, "mid_block.resnets.0", dtype, temb=True),
        "attn": _transformer2d(s, "mid_block.attentions.0", dtype, extras),
        "res2": _resnet(s, "mid_block.resnets.1", dtype, temb=True),
    }

    for i in range(n):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"].append(
                _resnet(s, f"up_blocks.{i}.resnets.{j}", dtype, temb=True))
            if f"up_blocks.{i}.attentions.{j}.proj_in.weight" in s:
                blk["attns"].append(_transformer2d(
                    s, f"up_blocks.{i}.attentions.{j}", dtype, extras))
        us = f"up_blocks.{i}.upsamplers.0.conv"
        if us + ".weight" in s:
            blk["upsample"] = _conv(s, us, dtype)
        p["up"].append(blk)

    p["norm_out"] = _gn(s, "conv_norm_out")
    p["conv_out"] = _conv(s, "conv_out", dtype)
    return p


# ---------------------------------------------------------------------------
# exporters (our pytrees → diffusers state-dict naming). Used to ship weights
# back to torch users and as the round-trip test of the mapping above.
# ---------------------------------------------------------------------------
def _x_lin(out, prefix, p):
    out[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["w"], np.float32).T)
    if "b" in p:
        out[prefix + ".bias"] = np.asarray(p["b"], np.float32)


def _x_conv(out, prefix, p):
    out[prefix + ".weight"] = np.ascontiguousarray(
        np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1))
    out[prefix + ".bias"] = np.asarray(p["b"], np.float32)


def _x_norm(out, prefix, p):
    out[prefix + ".weight"] = np.asarray(p["scale"], np.float32)
    out[prefix + ".bias"] = np.asarray(p["bias"], np.float32)


def _x_resnet(out, prefix, p):
    _x_norm(out, f"{prefix}.norm1", p["norm1"])
    _x_conv(out, f"{prefix}.conv1", p["conv1"])
    _x_norm(out, f"{prefix}.norm2", p["norm2"])
    _x_conv(out, f"{prefix}.conv2", p["conv2"])
    if "time_emb_proj" in p:
        _x_lin(out, f"{prefix}.time_emb_proj", p["time_emb_proj"])
    if "shortcut" in p:
        _x_conv(out, f"{prefix}.conv_shortcut", p["shortcut"])


def _x_attn(out, prefix, p):
    _x_lin(out, f"{prefix}.to_q", p["to_q"])
    _x_lin(out, f"{prefix}.to_k", p["to_k"])
    _x_lin(out, f"{prefix}.to_v", p["to_v"])
    _x_lin(out, f"{prefix}.to_out.0", p["to_out"])


def _x_tblock(out, prefix, p, extras: bool):
    base = f"{prefix}.transformer" if extras else prefix
    _x_norm(out, f"{base}.norm1", p["norm1"])
    _x_attn(out, f"{base}.attn1", p["attn1"])
    _x_norm(out, f"{base}.norm2", p["norm2"])
    _x_attn(out, f"{base}.attn2", p["attn2"])
    _x_norm(out, f"{base}.norm3", p["norm3"])
    _x_lin(out, f"{base}.ff.net.0.proj", p["ff_in"])
    _x_lin(out, f"{base}.ff.net.2", p["ff_out"])
    if "attn_refview" in p:
        _x_attn(out, f"{prefix}.attn_refview", p["attn_refview"])
    if "attn_multiview" in p:
        _x_attn(out, f"{prefix}.attn_multiview", p["attn_multiview"])


def _x_transformer2d(out, prefix, p, extras: bool):
    _x_norm(out, f"{prefix}.norm", p["norm"])
    _x_lin(out, f"{prefix}.proj_in", p["proj_in"])
    _x_tblock(out, f"{prefix}.transformer_blocks.0", p["block"], extras)
    _x_lin(out, f"{prefix}.proj_out", p["proj_out"])


def export_unet_core(params, prefix: str = "unet.", extras: bool = True) -> dict:
    out = {}
    _x_conv(out, "conv_in", params["conv_in"])
    _x_lin(out, "time_embedding.linear_1", params["time_mlp_in"])
    _x_lin(out, "time_embedding.linear_2", params["time_mlp_out"])
    if "class_embedding" in params:
        out["class_embedding.weight"] = np.asarray(params["class_embedding"], np.float32)
    if "learned_text_clip_gen" in params:
        out["learned_text_clip_gen"] = np.asarray(params["learned_text_clip_gen"], np.float32)
        out["learned_text_clip_ref"] = np.asarray(params["learned_text_clip_ref"], np.float32)
    for i, blk in enumerate(params["down"]):
        for j, r in enumerate(blk["resnets"]):
            _x_resnet(out, f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attns"]):
            _x_transformer2d(out, f"down_blocks.{i}.attentions.{j}", a, extras)
        if "downsample" in blk:
            _x_conv(out, f"down_blocks.{i}.downsamplers.0.conv", blk["downsample"])
    _x_resnet(out, "mid_block.resnets.0", params["mid"]["res1"])
    _x_transformer2d(out, "mid_block.attentions.0", params["mid"]["attn"], extras)
    _x_resnet(out, "mid_block.resnets.1", params["mid"]["res2"])
    for i, blk in enumerate(params["up"]):
        for j, r in enumerate(blk["resnets"]):
            _x_resnet(out, f"up_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attns"]):
            _x_transformer2d(out, f"up_blocks.{i}.attentions.{j}", a, extras)
        if "upsample" in blk:
            _x_conv(out, f"up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    _x_norm(out, "conv_norm_out", params["norm_out"])
    _x_conv(out, "conv_out", params["conv_out"])
    return {prefix + k: v for k, v in out.items()}


def export_paint_unet(params) -> dict:
    sd = export_unet_core(params, prefix="unet.", extras=True)
    if "dual" in params:
        sd.update(export_unet_core(params["dual"], prefix="unet_dual.",
                                   extras=False))
    return sd


def export_sd_vae(params) -> dict:
    out = {}
    enc, dec = params["encoder"], params["decoder"]
    _x_conv(out, "encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down"]):
        for j, r in enumerate(blk["resnets"]):
            _x_resnet(out, f"encoder.down_blocks.{i}.resnets.{j}", r)
        if "downsample" in blk:
            _x_conv(out, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                    blk["downsample"])
    _x_resnet(out, "encoder.mid_block.resnets.0", enc["mid"]["res1"])
    a = enc["mid"]["attn"]
    _x_norm(out, "encoder.mid_block.attentions.0.group_norm", a["norm"])
    _x_lin(out, "encoder.mid_block.attentions.0.to_q", a["q"])
    _x_lin(out, "encoder.mid_block.attentions.0.to_k", a["k"])
    _x_lin(out, "encoder.mid_block.attentions.0.to_v", a["v"])
    _x_lin(out, "encoder.mid_block.attentions.0.to_out.0", a["out"])
    _x_resnet(out, "encoder.mid_block.resnets.1", enc["mid"]["res2"])
    _x_norm(out, "encoder.conv_norm_out", enc["norm_out"])
    _x_conv(out, "encoder.conv_out", enc["conv_out"])
    _x_conv(out, "quant_conv", enc["quant_conv"])
    _x_conv(out, "post_quant_conv", dec["post_quant_conv"])
    _x_conv(out, "decoder.conv_in", dec["conv_in"])
    _x_resnet(out, "decoder.mid_block.resnets.0", dec["mid"]["res1"])
    a = dec["mid"]["attn"]
    _x_norm(out, "decoder.mid_block.attentions.0.group_norm", a["norm"])
    _x_lin(out, "decoder.mid_block.attentions.0.to_q", a["q"])
    _x_lin(out, "decoder.mid_block.attentions.0.to_k", a["k"])
    _x_lin(out, "decoder.mid_block.attentions.0.to_v", a["v"])
    _x_lin(out, "decoder.mid_block.attentions.0.to_out.0", a["out"])
    _x_resnet(out, "decoder.mid_block.resnets.1", dec["mid"]["res2"])
    for i, blk in enumerate(dec["up"]):
        for j, r in enumerate(blk["resnets"]):
            _x_resnet(out, f"decoder.up_blocks.{i}.resnets.{j}", r)
        if "upsample" in blk:
            _x_conv(out, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                    blk["upsample"])
    _x_norm(out, "decoder.conv_norm_out", dec["norm_out"])
    _x_conv(out, "decoder.conv_out", dec["conv_out"])
    return out


def map_paint_unet(sd: Dict[str, np.ndarray], cfg, dtype="bf16") -> dict:
    """Full UNet2p5DConditionModel state dict (unet. + unet_dual.)."""
    from hunyuan3d2_tpu.models.paint_unet import dual_config

    params = map_unet_core(sd, cfg, dtype, prefix="unet.", extras=True)
    if cfg.use_dual_stream and any(k.startswith("unet_dual.") for k in sd):
        params["dual"] = map_unet_core(sd, dual_config(cfg), dtype,
                                       prefix="unet_dual.", extras=False)
    return params


def empty_prompt_embed(ckpt_path: str) -> np.ndarray:
    """[77, 768] CLIP-L hidden states for the "" prompt (the delight model's
    only prompt, dehighlight_utils.py:95), computed once with transformers
    CLIPTextModel from the checkpoint's text_encoder/ + tokenizer/."""
    import torch
    from transformers import CLIPTextModel, CLIPTokenizer

    import os

    tok = CLIPTokenizer.from_pretrained(os.path.join(ckpt_path, "tokenizer"))
    te = CLIPTextModel.from_pretrained(os.path.join(ckpt_path, "text_encoder"))
    ids = tok("", padding="max_length", max_length=tok.model_max_length,
              return_tensors="pt").input_ids
    with torch.no_grad():
        emb = te(ids)[0]
    return emb[0].float().numpy()


def load_delight_pipeline(cls, ckpt_path: str, dtype="bf16", **kwargs):
    """diffusers InstructPix2Pix checkpoint directory → DelightPipeline
    (reference construction: dehighlight_utils.py:23-37)."""
    import json
    import os

    from hunyuan3d2_tpu.io.checkpoints import load_state_dict
    from hunyuan3d2_tpu.models import sd_vae
    from hunyuan3d2_tpu.pipelines.delight import IP2P_UNET

    ujson_path = os.path.join(ckpt_path, "unet", "config.json")
    ujson = json.load(open(ujson_path)) if os.path.exists(ujson_path) else {}
    import dataclasses

    ucfg = dataclasses.replace(
        IP2P_UNET,
        in_channels=ujson.get("in_channels", 8),
        block_out_channels=tuple(ujson.get("block_out_channels",
                                           (320, 640, 1280, 1280))),
        layers_per_block=ujson.get("layers_per_block", 2),
        cross_attention_dim=ujson.get("cross_attention_dim", 768),
        num_heads=ujson.get("attention_head_dim", 8)
        if isinstance(ujson.get("attention_head_dim", 8), int) else None,
    )
    def _weights(sub):
        names = ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin")
        for name in names:
            p = os.path.join(ckpt_path, sub, name)
            if os.path.exists(p):
                return p
        raise FileNotFoundError(
            f"no {sub} weights found; searched "
            + ", ".join(os.path.join(ckpt_path, sub, n) for n in names))

    unet_ckpt, vae_ckpt = _weights("unet"), _weights("vae")
    unet_params = map_unet_core(load_state_dict(unet_ckpt), ucfg, dtype,
                                prefix="", extras=False)

    vjson_path = os.path.join(ckpt_path, "vae", "config.json")
    vjson = json.load(open(vjson_path)) if os.path.exists(vjson_path) else {}
    vcfg = sd_vae.SDVAEConfig(
        latent_channels=vjson.get("latent_channels", 4),
        block_out_channels=tuple(vjson.get("block_out_channels",
                                           (128, 256, 512, 512))),
        layers_per_block=vjson.get("layers_per_block", 2),
        scaling_factor=vjson.get("scaling_factor", 0.18215),
    )
    vae_params = map_sd_vae(load_state_dict(vae_ckpt), vcfg, dtype)
    return cls(unet_params, ucfg, vae_params, vcfg,
               empty_prompt_embed(ckpt_path), **kwargs)


def load_upscale_pipeline(cls, ckpt_path: str, dtype="bf16", **kwargs):
    """diffusers StableDiffusionUpscalePipeline checkpoint directory →
    UpscalePipeline (reference construction: imagesuper_utils.py:19-24).
    UNet/VAE/scheduler hyper-parameters come from the config.json files."""
    import dataclasses
    import json
    import os

    from hunyuan3d2_tpu.io.checkpoints import load_state_dict
    from hunyuan3d2_tpu.models import sd_vae
    from hunyuan3d2_tpu.pipelines.upscale import X4_UNET

    def _json(sub):
        p = os.path.join(ckpt_path, sub, "config.json")
        return json.load(open(p)) if os.path.exists(p) else {}

    ujson = _json("unet")
    down_types = ujson.get("down_block_types")
    head = ujson.get("attention_head_dim", 8)
    ucfg = dataclasses.replace(
        X4_UNET,
        in_channels=ujson.get("in_channels", 7),
        block_out_channels=tuple(ujson.get("block_out_channels",
                                           X4_UNET.block_out_channels)),
        layers_per_block=ujson.get("layers_per_block", 2),
        cross_attention_dim=ujson.get("cross_attention_dim", 1024),
        num_heads=head if isinstance(head, int) else None,
        down_cross=tuple("CrossAttn" in t for t in down_types)
        if down_types else X4_UNET.down_cross,
        class_embed_type="timestep"
        if ujson.get("class_embed_type") == "timestep" else "table",
        num_class_embeds=ujson.get("num_class_embeds") or 1000,
    )

    def _weights(sub):
        for name in ("diffusion_pytorch_model.safetensors",
                     "diffusion_pytorch_model.bin"):
            p = os.path.join(ckpt_path, sub, name)
            if os.path.exists(p):
                return load_state_dict(p)
        raise FileNotFoundError(f"no weights under {ckpt_path}/{sub}")

    unet_params = map_unet_core(_weights("unet"), ucfg, dtype,
                                prefix="", extras=False)
    vjson = _json("vae")
    vcfg = sd_vae.SDVAEConfig(
        latent_channels=vjson.get("latent_channels", 4),
        block_out_channels=tuple(vjson.get("block_out_channels",
                                           (128, 256, 512))),
        layers_per_block=vjson.get("layers_per_block", 2),
        scaling_factor=vjson.get("scaling_factor", 0.08333),
    )
    vae_params = map_sd_vae(_weights("vae"), vcfg, dtype)

    # scheduler hyper-parameters from the checkpoint (ADVICE r3: the denoise
    # DDIM and the low-res conditioning DDPM have *different* beta schedules
    # in the real x4-upscaler checkpoint)
    from hunyuan3d2_tpu.pipelines.paint_schedulers import (
        DDIMScheduler, alphas_cumprod_from_config)

    def _sched_json(sub):
        p = os.path.join(ckpt_path, sub, "scheduler_config.json")
        return json.load(open(p)) if os.path.exists(p) else None

    scfg, lrcfg = _sched_json("scheduler"), _sched_json("low_res_scheduler")
    if scfg is not None:
        kwargs.setdefault("scheduler", DDIMScheduler.from_config(scfg))
    if lrcfg is not None:
        kwargs.setdefault("low_res_alphas_cumprod",
                          alphas_cumprod_from_config(lrcfg))
    return cls(unet_params, ucfg, vae_params, vcfg,
               empty_prompt_embed(ckpt_path), **kwargs)


# ---------------------------------------------------------------------------
# HunyuanDiT (text→image transformer, models/hunyuan_dit.py)
# ---------------------------------------------------------------------------
def _hdit_attn(sd, prefix, dtype):
    return {
        "q": _lin(sd, f"{prefix}.to_q", dtype),
        "k": _lin(sd, f"{prefix}.to_k", dtype),
        "v": _lin(sd, f"{prefix}.to_v", dtype),
        "out": _lin(sd, f"{prefix}.to_out.0", dtype),
        "q_norm_scale": sd[f"{prefix}.norm_q.weight"].astype(np.float32),
        "q_norm_bias": sd[f"{prefix}.norm_q.bias"].astype(np.float32),
        "k_norm_scale": sd[f"{prefix}.norm_k.weight"].astype(np.float32),
        "k_norm_bias": sd[f"{prefix}.norm_k.bias"].astype(np.float32),
    }


def _hdit_block(sd, i, dtype, skip: bool):
    pre = f"blocks.{i}"
    p = {
        "norm1_scale": sd[f"{pre}.norm1.norm.weight"].astype(np.float32),
        "norm1_bias": sd[f"{pre}.norm1.norm.bias"].astype(np.float32),
        "norm1_linear": _lin(sd, f"{pre}.norm1.linear", dtype),
        "attn1": _hdit_attn(sd, f"{pre}.attn1", dtype),
        "norm2_scale": sd[f"{pre}.norm2.weight"].astype(np.float32),
        "norm2_bias": sd[f"{pre}.norm2.bias"].astype(np.float32),
        "attn2": _hdit_attn(sd, f"{pre}.attn2", dtype),
        "norm3_scale": sd[f"{pre}.norm3.weight"].astype(np.float32),
        "norm3_bias": sd[f"{pre}.norm3.bias"].astype(np.float32),
        "mlp_in": _lin(sd, f"{pre}.ff.net.0.proj", dtype),
        "mlp_out": _lin(sd, f"{pre}.ff.net.2", dtype),
    }
    if skip:
        p["skip_norm_scale"] = sd[f"{pre}.skip_norm.weight"].astype(np.float32)
        p["skip_norm_bias"] = sd[f"{pre}.skip_norm.bias"].astype(np.float32)
        p["skip_linear"] = _lin(sd, f"{pre}.skip_linear", dtype)
    return p


def map_hunyuan_dit(sd: Dict[str, np.ndarray], cfg, dtype="bf16") -> dict:
    """diffusers HunyuanDiT2DModel state dict → models/hunyuan_dit pytree.

    Layout notes: pos_embed.proj is a patch-stride conv [h, C, p, p] → our
    patchify linear flattens (p_row, p_col, C) so the kernel transposes to
    (kh, kw, in, out) then reshapes; per-layer blocks are STACKED (first
    depth//2+1 under "blocks", the skip-consuming rest under "skip_blocks").
    """
    import jax
    import numpy as _np

    dtype = _resolve_dtype(dtype)
    h = cfg.hidden_size
    pw = sd["pos_embed.proj.weight"]  # [h, C, p, p]
    patch = {
        "w": _np.ascontiguousarray(
            pw.transpose(2, 3, 1, 0).reshape(-1, h)).astype(dtype),
        "b": sd["pos_embed.proj.bias"].astype(dtype),
    }
    params = {
        "patch_embed": patch,
        "text_embedder": {
            "fc1": _lin(sd, "text_embedder.linear_1", dtype),
            "fc2": _lin(sd, "text_embedder.linear_2", dtype),
        },
        "text_embedding_padding":
            sd["text_embedding_padding"].astype(np.float32),
        "timestep_embedder": {
            "in_layer": _lin(sd, "time_extra_emb.timestep_embedder.linear_1",
                             dtype),
            "out_layer": _lin(sd, "time_extra_emb.timestep_embedder.linear_2",
                              dtype),
        },
        "pooler": {
            "pos": sd["time_extra_emb.pooler.positional_embedding"].astype(
                np.float32),
            "q": _lin(sd, "time_extra_emb.pooler.q_proj", dtype),
            "k": _lin(sd, "time_extra_emb.pooler.k_proj", dtype),
            "v": _lin(sd, "time_extra_emb.pooler.v_proj", dtype),
            "out": _lin(sd, "time_extra_emb.pooler.c_proj", dtype),
        },
        **({"style_embedder":
            sd["time_extra_emb.style_embedder.weight"].astype(np.float32)}
           if cfg.use_style_meta else {}),
        "extra_embedder": {
            "in_layer": _lin(sd, "time_extra_emb.extra_embedder.linear_1",
                             dtype),
            "out_layer": _lin(sd, "time_extra_emb.extra_embedder.linear_2",
                              dtype),
        },
        "norm_out": {"linear": _lin(sd, "norm_out.linear", dtype)},
        "proj_out": _lin(sd, "proj_out", dtype),
    }
    pre = [_hdit_block(sd, i, dtype, skip=False) for i in range(cfg.n_pre)]
    post = [_hdit_block(sd, i + cfg.n_pre, dtype, skip=True)
            for i in range(cfg.n_skip)]
    params["blocks"] = jax.tree.map(lambda *xs: _np.stack(xs), *pre)
    params["skip_blocks"] = jax.tree.map(lambda *xs: _np.stack(xs), *post)
    return params


def _x_hdit_attn(out, prefix, p):
    _x_lin(out, f"{prefix}.to_q", p["q"])
    _x_lin(out, f"{prefix}.to_k", p["k"])
    _x_lin(out, f"{prefix}.to_v", p["v"])
    _x_lin(out, f"{prefix}.to_out.0", p["out"])
    out[f"{prefix}.norm_q.weight"] = np.asarray(p["q_norm_scale"], np.float32)
    out[f"{prefix}.norm_q.bias"] = np.asarray(p["q_norm_bias"], np.float32)
    out[f"{prefix}.norm_k.weight"] = np.asarray(p["k_norm_scale"], np.float32)
    out[f"{prefix}.norm_k.bias"] = np.asarray(p["k_norm_bias"], np.float32)


def export_hunyuan_dit(params, cfg) -> dict:
    """models/hunyuan_dit pytree → diffusers-named state dict (round-trip
    testing; also lets torch re-load our randomly initialized weights)."""
    import jax
    import numpy as _np

    out = {}
    p = params
    w = _np.asarray(p["patch_embed"]["w"], _np.float32)
    c = cfg.in_channels
    ps = cfg.patch_size
    out["pos_embed.proj.weight"] = _np.ascontiguousarray(
        w.reshape(ps, ps, c, cfg.hidden_size).transpose(3, 2, 0, 1))
    out["pos_embed.proj.bias"] = _np.asarray(p["patch_embed"]["b"],
                                             _np.float32)
    _x_lin(out, "text_embedder.linear_1", p["text_embedder"]["fc1"])
    _x_lin(out, "text_embedder.linear_2", p["text_embedder"]["fc2"])
    out["text_embedding_padding"] = _np.asarray(
        p["text_embedding_padding"], _np.float32)
    _x_lin(out, "time_extra_emb.timestep_embedder.linear_1",
           p["timestep_embedder"]["in_layer"])
    _x_lin(out, "time_extra_emb.timestep_embedder.linear_2",
           p["timestep_embedder"]["out_layer"])
    out["time_extra_emb.pooler.positional_embedding"] = _np.asarray(
        p["pooler"]["pos"], _np.float32)
    _x_lin(out, "time_extra_emb.pooler.q_proj", p["pooler"]["q"])
    _x_lin(out, "time_extra_emb.pooler.k_proj", p["pooler"]["k"])
    _x_lin(out, "time_extra_emb.pooler.v_proj", p["pooler"]["v"])
    _x_lin(out, "time_extra_emb.pooler.c_proj", p["pooler"]["out"])
    if "style_embedder" in p:
        out["time_extra_emb.style_embedder.weight"] = _np.asarray(
            p["style_embedder"], _np.float32)
    _x_lin(out, "time_extra_emb.extra_embedder.linear_1",
           p["extra_embedder"]["in_layer"])
    _x_lin(out, "time_extra_emb.extra_embedder.linear_2",
           p["extra_embedder"]["out_layer"])
    _x_lin(out, "norm_out.linear", p["norm_out"]["linear"])
    _x_lin(out, "proj_out", p["proj_out"])

    def unstack(tree, n):
        return [jax.tree.map(lambda x: _np.asarray(x[i]), tree)
                for i in range(n)]

    for i, blk in enumerate(unstack(p["blocks"], cfg.n_pre)
                            + unstack(p["skip_blocks"], cfg.n_skip)):
        pre = f"blocks.{i}"
        out[f"{pre}.norm1.norm.weight"] = blk["norm1_scale"]
        out[f"{pre}.norm1.norm.bias"] = blk["norm1_bias"]
        _x_lin(out, f"{pre}.norm1.linear", blk["norm1_linear"])
        _x_hdit_attn(out, f"{pre}.attn1", blk["attn1"])
        out[f"{pre}.norm2.weight"] = blk["norm2_scale"]
        out[f"{pre}.norm2.bias"] = blk["norm2_bias"]
        _x_hdit_attn(out, f"{pre}.attn2", blk["attn2"])
        out[f"{pre}.norm3.weight"] = blk["norm3_scale"]
        out[f"{pre}.norm3.bias"] = blk["norm3_bias"]
        _x_lin(out, f"{pre}.ff.net.0.proj", blk["mlp_in"])
        _x_lin(out, f"{pre}.ff.net.2", blk["mlp_out"])
        if "skip_linear" in blk:
            out[f"{pre}.skip_norm.weight"] = blk["skip_norm_scale"]
            out[f"{pre}.skip_norm.bias"] = blk["skip_norm_bias"]
            _x_lin(out, f"{pre}.skip_linear", blk["skip_linear"])
    return out


def _build_t2i_text_encoder(ckpt_path: str, dcfg):
    """transformers-backed text encoding for a diffusers HunyuanDiT layout:
    text_encoder/ = Chinese-CLIP BertModel, text_encoder_2/ = mT5 encoder.
    Returns encode_text(prompt, negative) → (neg_states, pos_states) where
    each is (clip [1,77,1024], clip_mask, t5 [1,256,2048], t5_mask) — or
    None when the dirs or transformers are unavailable."""
    import os

    te1 = os.path.join(ckpt_path, "text_encoder")
    te2 = os.path.join(ckpt_path, "text_encoder_2")
    if not (os.path.isdir(te1) and os.path.isdir(te2)):
        return None
    try:
        import torch
        from transformers import AutoTokenizer, BertModel, T5EncoderModel
    except ImportError:
        return None
    bert = BertModel.from_pretrained(te1).eval()
    t5 = T5EncoderModel.from_pretrained(te2).eval()
    tk1 = AutoTokenizer.from_pretrained(os.path.join(ckpt_path, "tokenizer"))
    tk2 = AutoTokenizer.from_pretrained(os.path.join(ckpt_path, "tokenizer_2"))

    def enc_one(text):
        b = tk1(text, padding="max_length", max_length=dcfg.text_len,
                truncation=True, return_tensors="pt")
        tb = tk2(text, padding="max_length", max_length=dcfg.t5_len,
                 truncation=True, return_tensors="pt")
        with torch.no_grad():
            clip = bert(input_ids=b.input_ids,
                        attention_mask=b.attention_mask).last_hidden_state
            t5s = t5(input_ids=tb.input_ids,
                     attention_mask=tb.attention_mask).last_hidden_state
        return (clip.float().numpy(), b.attention_mask.float().numpy(),
                t5s.float().numpy(), tb.attention_mask.float().numpy())

    def encode_text(prompt, negative_prompt):
        return enc_one(negative_prompt), enc_one(prompt)

    return encode_text


def load_t2i_pipeline(cls, ckpt_path: str, dtype="bf16", **kwargs):
    """diffusers HunyuanDiT checkpoint directory → HunyuanDiTJAXPipeline.
    Text encoders load through transformers (CPU torch) when the
    text_encoder/ dirs exist; without them the pipeline falls back to its
    pseudo-random test embeddings WITH a logged warning."""
    import dataclasses
    import json
    import os

    from hunyuan3d2_tpu.io.checkpoints import load_state_dict
    from hunyuan3d2_tpu.models import hunyuan_dit, sd_vae

    def _json(sub):
        p = os.path.join(ckpt_path, sub, "config.json")
        return json.load(open(p)) if os.path.exists(p) else {}

    tj = _json("transformer")
    head = tj.get("attention_head_dim", 88)
    nh = tj.get("num_attention_heads", 16)
    depth = tj.get("num_layers", 40)
    dcfg = dataclasses.replace(
        hunyuan_dit.FULL,
        hidden_size=head * nh, num_heads=nh,
        depth=depth,
        in_channels=tj.get("in_channels", 4),
        mlp_ratio=tj.get("mlp_ratio", 4.0),
        text_dim=tj.get("cross_attention_dim", 1024),
        t5_dim=tj.get("cross_attention_dim_t5", 2048),
        text_len=tj.get("text_len", 77), t5_len=tj.get("text_len_t5", 256),
        pooled_dim=tj.get("pooled_projection_dim", 1024),
        # v1.1/v1.2 checkpoints drop the style + image-meta conditioning
        use_style_meta=bool(
            tj.get("use_style_cond_and_image_meta_size", True)),
        # PAG layers outside a shallow checkpoint's depth would be dead
        pag_layers=tuple(i for i in hunyuan_dit.FULL.pag_layers
                         if i < depth),
    )

    def _weights(sub):
        for name in ("diffusion_pytorch_model.safetensors",
                     "diffusion_pytorch_model.bin"):
            p = os.path.join(ckpt_path, sub, name)
            if os.path.exists(p):
                return load_state_dict(p)
        raise FileNotFoundError(f"no weights under {ckpt_path}/{sub}")

    dit_params = map_hunyuan_dit(_weights("transformer"), dcfg, dtype)
    vj = _json("vae")
    vcfg = sd_vae.SDVAEConfig(
        latent_channels=vj.get("latent_channels", 4),
        block_out_channels=tuple(vj.get("block_out_channels",
                                        (128, 256, 512, 512))),
        layers_per_block=vj.get("layers_per_block", 2),
        scaling_factor=vj.get("scaling_factor", 0.13025),
    )
    vae_params = map_sd_vae(_weights("vae"), vcfg, dtype)
    kwargs.setdefault("encode_text", _build_t2i_text_encoder(ckpt_path, dcfg))
    pipe = cls(dit_params, dcfg, vae_params, vcfg, **kwargs)
    pipe._from_checkpoint = True   # gates the pseudo-embedding warning
    return pipe


# ---------------------------------------------------------------------------
# ControlNet + IP-Adapter (models/controlnet.py, models/ip_adapter.py)
# ---------------------------------------------------------------------------
def map_controlnet(sd: Dict[str, np.ndarray], cfg, dtype="bf16") -> dict:
    """diffusers ControlNetModel state dict → controlnet param tree.

    Naming: the down/mid trunk shares UNet2DConditionModel names; plus
    controlnet_cond_embedding.{conv_in,blocks.N,conv_out} and the zero convs
    controlnet_down_blocks.N / controlnet_mid_block."""
    dtype = _resolve_dtype(dtype)
    n = len(cfg.block_out_channels)
    p = {
        "conv_in": _conv(sd, "conv_in", dtype),
        "time_mlp_in": _lin(sd, "time_embedding.linear_1", dtype),
        "time_mlp_out": _lin(sd, "time_embedding.linear_2", dtype),
        "down": [],
    }
    cond = {"conv_in": _conv(sd, "controlnet_cond_embedding.conv_in", dtype),
            "blocks": []}
    i = 0
    while f"controlnet_cond_embedding.blocks.{i}.weight" in sd:
        cond["blocks"].append(
            _conv(sd, f"controlnet_cond_embedding.blocks.{i}", dtype))
        i += 1
    # conv_out stays fp32: it is the zero-init tap — bf16 rounding of small
    # finetuned weights costs control fidelity disproportionately
    cond["conv_out"] = _conv(sd, "controlnet_cond_embedding.conv_out",
                             np.float32)
    p["cond_embed"] = cond

    for i in range(n):
        blk = {"resnets": [], "attns": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(
                _resnet(sd, f"down_blocks.{i}.resnets.{j}", dtype, temb=True))
            if f"down_blocks.{i}.attentions.{j}.proj_in.weight" in sd:
                blk["attns"].append(_transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}", dtype,
                    extras=False))
        ds = f"down_blocks.{i}.downsamplers.0.conv"
        if ds + ".weight" in sd:
            blk["downsample"] = _conv(sd, ds, dtype)
        p["down"].append(blk)

    p["mid"] = {
        "res1": _resnet(sd, "mid_block.resnets.0", dtype, temb=True),
        "attn": _transformer2d(sd, "mid_block.attentions.0", dtype,
                               extras=False),
        "res2": _resnet(sd, "mid_block.resnets.1", dtype, temb=True),
    }
    zc = []
    i = 0
    while f"controlnet_down_blocks.{i}.weight" in sd:
        zc.append(_conv(sd, f"controlnet_down_blocks.{i}", np.float32))
        i += 1
    p["ctrl_down"] = zc
    p["ctrl_mid"] = _conv(sd, "controlnet_mid_block", np.float32)
    return p


def map_ip_resampler(sd: Dict[str, np.ndarray], dtype="bf16",
                     prefix: str = "image_proj.") -> dict:
    """IP-Adapter-plus 'image_proj' keys (original ip_adapter/resampler.py
    naming) → ip_adapter.init_resampler tree."""
    dtype = _resolve_dtype(dtype)
    s = {kk[len(prefix):]: vv for kk, vv in sd.items()
         if kk.startswith(prefix)}
    p = {
        "latents": np.asarray(s["latents"], np.float32).reshape(
            s["latents"].shape[-2], s["latents"].shape[-1]),
        "proj_in": _lin(s, "proj_in", dtype),
        "proj_out": _lin(s, "proj_out", dtype),
        "norm_out": _ln(s, "norm_out"),
        "layers": [],
    }
    i = 0
    while f"layers.{i}.0.to_q.weight" in s:
        p["layers"].append({
            "norm1": _ln(s, f"layers.{i}.0.norm1"),
            "norm2": _ln(s, f"layers.{i}.0.norm2"),
            "to_q": _lin(s, f"layers.{i}.0.to_q", dtype, bias=False),
            "to_kv": _lin(s, f"layers.{i}.0.to_kv", dtype, bias=False),
            "to_out": _lin(s, f"layers.{i}.0.to_out", dtype, bias=False),
            # FeedForward = Sequential(LayerNorm, Linear, GELU, Linear)
            "ff_norm": _ln(s, f"layers.{i}.1.0"),
            "ff_in": _lin(s, f"layers.{i}.1.1", dtype, bias=False),
            "ff_out": _lin(s, f"layers.{i}.1.3", dtype, bias=False),
        })
        i += 1
    return p


def graft_ip_adapter_weights(unet_params, sd: Dict[str, np.ndarray],
                             dtype="bf16", prefix: str = "ip_adapter."):
    """Load the 'ip_adapter' to_k_ip/to_v_ip weights onto a UNet tree.

    diffusers key order: unet.attn_processors traversal = ALL down blocks,
    ALL up blocks, then mid (mid_block is assigned after the ModuleLists in
    UNet2DConditionModel.__init__), attn2 processors only, key_id 1,3,5,…"""
    dtype = _resolve_dtype(dtype)
    s = {kk[len(prefix):]: vv for kk, vv in sd.items()
         if kk.startswith(prefix)}

    order = []
    for blk in unet_params["down"]:
        order += [t2d["block"]["attn2"] for t2d in blk["attns"]]
    for blk in unet_params.get("up", []):
        order += [t2d["block"]["attn2"] for t2d in blk["attns"]]
    order.append(unet_params["mid"]["attn"]["block"]["attn2"])

    key_id = 1
    for a in order:
        a["to_k_ip"] = {"w": np.ascontiguousarray(
            np.asarray(s[f"{key_id}.to_k_ip.weight"]).T).astype(dtype)}
        a["to_v_ip"] = {"w": np.ascontiguousarray(
            np.asarray(s[f"{key_id}.to_v_ip.weight"]).T).astype(dtype)}
        key_id += 2
    return unet_params


def load_align_pipeline(cls, sd_path: str, controlnet_path: str,
                        ip_adapter_path: str = None, dtype="bf16", **kwargs):
    """Reference construction (alignImg4Tex_utils.py:22-33): SD1.5 dir +
    ControlNetModel dir (+ optional IP-Adapter safetensors file) →
    ControlNetSDPipeline."""
    import dataclasses
    import json
    import os

    from hunyuan3d2_tpu.io.checkpoints import load_state_dict
    from hunyuan3d2_tpu.models import ip_adapter as ipa
    from hunyuan3d2_tpu.models import sd_vae
    from hunyuan3d2_tpu.pipelines.align import SD15_UNET

    def _json(base, sub=""):
        p = os.path.join(base, sub, "config.json")
        return json.load(open(p)) if os.path.exists(p) else {}

    def _weights(base, sub=""):
        for name in ("diffusion_pytorch_model.safetensors",
                     "diffusion_pytorch_model.bin",
                     "diffusion_pytorch_model.fp16.safetensors"):
            p = os.path.join(base, sub, name)
            if os.path.exists(p):
                return load_state_dict(p)
        raise FileNotFoundError(f"no weights under {base}/{sub}")

    ujson = _json(sd_path, "unet")
    head = ujson.get("attention_head_dim", 8)
    ucfg = dataclasses.replace(
        SD15_UNET,
        in_channels=ujson.get("in_channels", 4),
        block_out_channels=tuple(ujson.get("block_out_channels",
                                           (320, 640, 1280, 1280))),
        layers_per_block=ujson.get("layers_per_block", 2),
        cross_attention_dim=ujson.get("cross_attention_dim", 768),
        num_heads=head if isinstance(head, int) else None,
    )
    unet_params = map_unet_core(_weights(sd_path, "unet"), ucfg, dtype,
                                prefix="", extras=False)
    ctrl_params = map_controlnet(_weights(controlnet_path), ucfg, dtype)

    vjson = _json(sd_path, "vae")
    vcfg = sd_vae.SDVAEConfig(
        latent_channels=vjson.get("latent_channels", 4),
        block_out_channels=tuple(vjson.get("block_out_channels",
                                           (128, 256, 512, 512))),
        layers_per_block=vjson.get("layers_per_block", 2),
        scaling_factor=vjson.get("scaling_factor", 0.18215),
    )
    vae_params = map_sd_vae(_weights(sd_path, "vae"), vcfg, dtype)

    if ip_adapter_path is not None and os.path.exists(ip_adapter_path):
        ip_sd = load_state_dict(ip_adapter_path)
        res_params = map_ip_resampler(ip_sd, dtype)
        graft_ip_adapter_weights(unet_params, ip_sd, dtype)
        d = res_params["layers"][0]["to_q"]["w"].shape[0]
        rcfg = dataclasses.replace(
            ipa.PLUS_SD15,
            dim=d,
            depth=len(res_params["layers"]),
            num_queries=res_params["latents"].shape[0],
            embedding_dim=res_params["proj_in"]["w"].shape[0],
            output_dim=res_params["proj_out"]["w"].shape[1],
            heads=d // ipa.PLUS_SD15.dim_head,
        )
    else:
        # no adapter file → zero-grafted (inert) adapter + default config
        import jax

        rcfg = dataclasses.replace(ipa.PLUS_SD15,
                                   output_dim=ucfg.cross_attention_dim)
        res_params = ipa.init_resampler(jax.random.PRNGKey(0), rcfg)
        # numpy-tree zero graft (same semantics as ipa.add_ip_adapter)
        for blk in unet_params["down"] + unet_params["up"]:
            for t2d in blk["attns"]:
                a = t2d["block"]["attn2"]
                d = a["to_q"]["w"].shape[1]
                z = np.zeros((ucfg.cross_attention_dim, d), np.float32)
                a["to_k_ip"], a["to_v_ip"] = {"w": z}, {"w": z.copy()}
        a = unet_params["mid"]["attn"]["block"]["attn2"]
        d = a["to_q"]["w"].shape[1]
        z = np.zeros((ucfg.cross_attention_dim, d), np.float32)
        a["to_k_ip"], a["to_v_ip"] = {"w": z}, {"w": z.copy()}

    text = empty_prompt_embed(sd_path)
    return cls(unet_params, ucfg, ctrl_params, ucfg, vae_params, vcfg,
               res_params, rcfg, text, np.zeros_like(text), **kwargs)


def export_controlnet(params) -> dict:
    """controlnet param tree → diffusers ControlNetModel state-dict naming
    (round-trip twin of map_controlnet; ships weights back to torch users)."""
    out = {}
    _x_conv(out, "conv_in", params["conv_in"])
    _x_lin(out, "time_embedding.linear_1", params["time_mlp_in"])
    _x_lin(out, "time_embedding.linear_2", params["time_mlp_out"])
    ce = params["cond_embed"]
    _x_conv(out, "controlnet_cond_embedding.conv_in", ce["conv_in"])
    for i, b in enumerate(ce["blocks"]):
        _x_conv(out, f"controlnet_cond_embedding.blocks.{i}", b)
    _x_conv(out, "controlnet_cond_embedding.conv_out", ce["conv_out"])
    for i, blk in enumerate(params["down"]):
        for j, r in enumerate(blk["resnets"]):
            _x_resnet(out, f"down_blocks.{i}.resnets.{j}", r)
        for j, a in enumerate(blk["attns"]):
            _x_transformer2d(out, f"down_blocks.{i}.attentions.{j}", a,
                             extras=False)
        if "downsample" in blk:
            _x_conv(out, f"down_blocks.{i}.downsamplers.0.conv",
                    blk["downsample"])
    _x_resnet(out, "mid_block.resnets.0", params["mid"]["res1"])
    _x_transformer2d(out, "mid_block.attentions.0", params["mid"]["attn"],
                     extras=False)
    _x_resnet(out, "mid_block.resnets.1", params["mid"]["res2"])
    for i, zc in enumerate(params["ctrl_down"]):
        _x_conv(out, f"controlnet_down_blocks.{i}", zc)
    _x_conv(out, "controlnet_mid_block", params["ctrl_mid"])
    return out


def export_ip_adapter(unet_params, resampler_params) -> dict:
    """(unet tree with to_k_ip/to_v_ip, resampler tree) → the IP-Adapter
    checkpoint layout ('image_proj.*' + 'ip_adapter.{1,3,5,…}.to_{k,v}_ip')."""
    out = {}
    p = resampler_params
    out["image_proj.latents"] = np.asarray(p["latents"], np.float32)[None]
    _x_lin(out, "image_proj.proj_in", p["proj_in"])
    _x_lin(out, "image_proj.proj_out", p["proj_out"])
    _x_norm(out, "image_proj.norm_out", p["norm_out"])
    for i, lp in enumerate(p["layers"]):
        _x_norm(out, f"image_proj.layers.{i}.0.norm1", lp["norm1"])
        _x_norm(out, f"image_proj.layers.{i}.0.norm2", lp["norm2"])
        _x_lin(out, f"image_proj.layers.{i}.0.to_q", lp["to_q"])
        _x_lin(out, f"image_proj.layers.{i}.0.to_kv", lp["to_kv"])
        _x_lin(out, f"image_proj.layers.{i}.0.to_out", lp["to_out"])
        _x_norm(out, f"image_proj.layers.{i}.1.0", lp["ff_norm"])
        _x_lin(out, f"image_proj.layers.{i}.1.1", lp["ff_in"])
        _x_lin(out, f"image_proj.layers.{i}.1.3", lp["ff_out"])

    order = []
    for blk in unet_params["down"]:
        order += [t["block"]["attn2"] for t in blk["attns"]]
    for blk in unet_params.get("up", []):
        order += [t["block"]["attn2"] for t in blk["attns"]]
    order.append(unet_params["mid"]["attn"]["block"]["attn2"])
    key_id = 1
    for a in order:
        if "to_k_ip" not in a:
            continue
        _x_lin(out, f"ip_adapter.{key_id}.to_k_ip", a["to_k_ip"])
        _x_lin(out, f"ip_adapter.{key_id}.to_v_ip", a["to_v_ip"])
        key_id += 2
    return out
