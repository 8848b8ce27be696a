"""Checkpoint ingestion: unchanged HF/torch checkpoints → our param pytrees.

Behavioral parity:
  * smart_load_model — local $HY3DGEN_MODELS path else HF snapshot_download
    (reference hy3dgen/shapegen/utils.py:89-126);
  * single-file multi-model checkpoints split by top-level key prefix
    (pipelines.py:157-167);
  * DeepSpeed key remaps ('_forward_module.' / 'model.' stripping,
    hunyuan3ddit.py:361-377);
  * per-checkpoint YAML config with target/params registry
    (pipelines.py:113-128) → mapped onto our model configs.

Torch→JAX conventions: Linear weights [out,in] → transposed to [in,out];
Conv2d patch-embed kernels [H, C, kh, kw] → flattened to [C·kh·kw, H];
per-layer block weights are STACKED along axis 0 (models run lax.scan).
"""

from __future__ import annotations

import os
import re
from typing import Dict

import numpy as np

from hunyuan3d2_tpu.utils.logger import get_logger

logger = get_logger("hunyuan3d2_tpu.checkpoints")


# ---------------------------------------------------------------------------
# raw tensor loading
# ---------------------------------------------------------------------------
def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def load_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Normalize the torch .ckpt zoo to a flat 'top.rest' dict:

    * pipeline single-file ckpt — NESTED {model: sd, vae: sd, conditioner:
      sd} (reference pipelines.py:168-177 loads ckpt['model'] etc.); each
      sub-dict may carry DeepSpeed '_forward_module.' wrappers;
    * flat multi-model ckpt (model./vae./... prefixes like the safetensors
      layout): keep prefixes, strip only the DeepSpeed wrapper;
    * standalone submodel ckpt (e.g. a DeepSpeed-trained DiT): strip
      '_forward_module.' and the 'model.' module wrapper
      (parity: hunyuan3ddit.py:361-377).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]

    def to_np(v):
        return v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)

    if all(isinstance(v, dict) for v in ckpt.values()):
        out = {}
        for top, sub in ckpt.items():
            for k, v in sub.items():
                out[f"{top}.{k.replace('_forward_module.', '')}"] = to_np(v)
        return out
    tops = {k.replace("_forward_module.", "").split(".", 1)[0] for k in ckpt}
    multi = {"model", "vae"} <= tops
    out = {}
    for k, v in ckpt.items():
        k = k.replace("_forward_module.", "")
        if not multi and k.startswith("model."):
            k = k[len("model."):]
        out[k] = to_np(v)
    return out


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    return load_torch_ckpt(path)


def split_by_top_key(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Split a single-file multi-model state dict by top-level model name
    (parity: pipelines.py:157-167)."""
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        top, rest = k.split(".", 1)
        out.setdefault(top, {})[rest] = v
    return out


def smart_load_model(model_path: str, subfolder: str, variant: str = "fp16"):
    """Resolve {model_path}/{subfolder}/config.yaml + model.{variant}.* locally
    (env HY3DGEN_MODELS, default ~/.cache/hy3dgen) or via HF snapshot_download
    (parity: utils.py:89-126). Returns (config_path, ckpt_path)."""
    base = os.path.expanduser(os.environ.get("HY3DGEN_MODELS", "~/.cache/hy3dgen"))
    candidates = [os.path.join(model_path, subfolder),
                  os.path.join(base, model_path, subfolder)]
    for d in candidates:
        cfg = os.path.join(d, "config.yaml")
        if os.path.exists(cfg):
            for ext in (f"model.{variant}.safetensors", f"model.{variant}.ckpt",
                        "model.safetensors", "model.ckpt"):
                ck = os.path.join(d, ext)
                if os.path.exists(ck):
                    return cfg, ck
    try:
        from huggingface_hub import snapshot_download

        path = snapshot_download(repo_id=model_path,
                                 allow_patterns=[f"{subfolder}/*"])
        d = os.path.join(path, subfolder)
        return smart_load_model(os.path.dirname(d), os.path.basename(d), variant)
    except Exception as e:
        raise FileNotFoundError(
            f"Model {model_path}/{subfolder} not found locally "
            f"(HY3DGEN_MODELS={base}) and hub download failed: {e}")


# ---------------------------------------------------------------------------
# torch name-space → our pytrees
# ---------------------------------------------------------------------------
def _resolve_dtype(dtype):
    if isinstance(dtype, str):
        if dtype in ("bf16", "bfloat16"):
            import ml_dtypes

            return np.dtype(ml_dtypes.bfloat16)
        if dtype in ("fp32", "f32"):
            return np.dtype(np.float32)
        if dtype in ("fp16", "f16"):
            return np.dtype(np.float16)
        return np.dtype(dtype)
    return dtype


def _lin(sd, prefix, dtype) -> dict:
    p = {"w": np.ascontiguousarray(sd[prefix + ".weight"].T).astype(dtype)}
    if prefix + ".bias" in sd:
        p["b"] = sd[prefix + ".bias"].astype(dtype)
    return p


def _stack(dicts):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs), *dicts)


def map_dit(sd: Dict[str, np.ndarray], cfg, dtype=np.float32) -> dict:
    """Map a Hunyuan3DDiT torch state dict onto models/dit.py param tree."""
    dtype = _resolve_dtype(dtype)
    f32 = np.float32
    params = {
        "latent_in": _lin(sd, "latent_in", dtype),
        "cond_in": _lin(sd, "cond_in", dtype),
        "time_in": {"in_layer": _lin(sd, "time_in.in_layer", dtype),
                    "out_layer": _lin(sd, "time_in.out_layer", dtype)},
        "final_layer": {
            "adaLN": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
            "linear": _lin(sd, "final_layer.linear", dtype),
        },
    }
    if cfg.guidance_embed:
        params["guidance_in"] = {
            "in_layer": _lin(sd, "guidance_in.in_layer", dtype),
            "out_layer": _lin(sd, "guidance_in.out_layer", dtype)}
    dbl = []
    for i in range(cfg.depth):
        b = f"double_blocks.{i}"
        dbl.append({
            "img_mod": _lin(sd, f"{b}.img_mod.lin", dtype),
            "img_qkv": _lin(sd, f"{b}.img_attn.qkv", dtype),
            "img_q_scale": sd[f"{b}.img_attn.norm.query_norm.scale"].astype(f32),
            "img_k_scale": sd[f"{b}.img_attn.norm.key_norm.scale"].astype(f32),
            "img_proj": _lin(sd, f"{b}.img_attn.proj", dtype),
            "img_mlp_in": _lin(sd, f"{b}.img_mlp.0", dtype),
            "img_mlp_out": _lin(sd, f"{b}.img_mlp.2", dtype),
            "txt_mod": _lin(sd, f"{b}.txt_mod.lin", dtype),
            "txt_qkv": _lin(sd, f"{b}.txt_attn.qkv", dtype),
            "txt_q_scale": sd[f"{b}.txt_attn.norm.query_norm.scale"].astype(f32),
            "txt_k_scale": sd[f"{b}.txt_attn.norm.key_norm.scale"].astype(f32),
            "txt_proj": _lin(sd, f"{b}.txt_attn.proj", dtype),
            "txt_mlp_in": _lin(sd, f"{b}.txt_mlp.0", dtype),
            "txt_mlp_out": _lin(sd, f"{b}.txt_mlp.2", dtype),
        })
    params["double_blocks"] = _stack(dbl)
    sgl = []
    for i in range(cfg.depth_single_blocks):
        b = f"single_blocks.{i}"
        sgl.append({
            "mod": _lin(sd, f"{b}.modulation.lin", dtype),
            "linear1": _lin(sd, f"{b}.linear1", dtype),
            "linear2": _lin(sd, f"{b}.linear2", dtype),
            "q_scale": sd[f"{b}.norm.query_norm.scale"].astype(f32),
            "k_scale": sd[f"{b}.norm.key_norm.scale"].astype(f32),
        })
    params["single_blocks"] = _stack(sgl)
    return params


def map_shapevae(sd: Dict[str, np.ndarray], cfg, dtype=np.float32) -> dict:
    """Map ShapeVAE torch state dict (hy3dgen naming: post_kl, transformer.
    resblocks.N.*, geo_decoder.*) onto models/shapevae.py param tree."""
    dtype = _resolve_dtype(dtype)
    f32 = np.float32

    def ln(prefix):
        return sd[prefix + ".weight"].astype(f32), sd[prefix + ".bias"].astype(f32)

    blocks = []
    for i in range(cfg.num_decoder_layers):
        b = f"transformer.resblocks.{i}"
        l1s, l1b = ln(f"{b}.ln_1")
        l2s, l2b = ln(f"{b}.ln_2")
        qs, qb = ln(f"{b}.attn.attention.q_norm")
        ks, kb = ln(f"{b}.attn.attention.k_norm")
        blocks.append({
            "ln_1_scale": l1s, "ln_1_bias": l1b,
            "c_qkv": _lin(sd, f"{b}.attn.c_qkv", dtype),
            "q_norm_scale": qs, "q_norm_bias": qb,
            "k_norm_scale": ks, "k_norm_bias": kb,
            "c_proj": _lin(sd, f"{b}.attn.c_proj", dtype),
            "ln_2_scale": l2s, "ln_2_bias": l2b,
            "mlp_fc": _lin(sd, f"{b}.mlp.c_fc", dtype),
            "mlp_proj": _lin(sd, f"{b}.mlp.c_proj", dtype),
        })
    g = "geo_decoder"
    l1s, l1b = ln(f"{g}.cross_attn_decoder.ln_1")
    l2s, l2b = ln(f"{g}.cross_attn_decoder.ln_2")
    l3s, l3b = ln(f"{g}.cross_attn_decoder.ln_3")
    qs, qb = ln(f"{g}.cross_attn_decoder.attn.attention.q_norm")
    ks, kb = ln(f"{g}.cross_attn_decoder.attn.attention.k_norm")
    lps, lpb = ln(f"{g}.ln_post")
    return {
        "post_kl": _lin(sd, "post_kl", dtype),
        "transformer": _stack(blocks),
        "geo_decoder": {
            "query_proj": _lin(sd, f"{g}.query_proj", dtype),
            "ln_1_scale": l1s, "ln_1_bias": l1b,
            "ln_2_scale": l2s, "ln_2_bias": l2b,
            "c_q": _lin(sd, f"{g}.cross_attn_decoder.attn.c_q", dtype),
            "c_kv": _lin(sd, f"{g}.cross_attn_decoder.attn.c_kv", dtype),
            "q_norm_scale": qs, "q_norm_bias": qb,
            "k_norm_scale": ks, "k_norm_bias": kb,
            "c_proj": _lin(sd, f"{g}.cross_attn_decoder.attn.c_proj", dtype),
            "ln_3_scale": l3s, "ln_3_bias": l3b,
            "mlp_fc": _lin(sd, f"{g}.cross_attn_decoder.mlp.c_fc", dtype),
            "mlp_proj": _lin(sd, f"{g}.cross_attn_decoder.mlp.c_proj", dtype),
            "ln_post_scale": lps, "ln_post_bias": lpb,
            "output_proj": _lin(sd, f"{g}.output_proj", dtype),
        },
    }


def map_dinov2(sd: Dict[str, np.ndarray], cfg, dtype=np.float32,
               prefix: str = "model.") -> dict:
    """Map a HF Dinov2Model state dict onto models/dinov2.py param tree."""
    dtype = _resolve_dtype(dtype)
    f32 = np.float32

    def g(k):
        return sd[prefix + k] if prefix + k in sd else sd[k]

    conv_w = g("embeddings.patch_embeddings.projection.weight")  # [H,C,p,p]
    h = conv_w.shape[0]
    patch_w = conv_w.reshape(h, -1).T.astype(dtype)              # [C*p*p, H]
    layers = []
    for i in range(cfg.num_layers):
        b = f"encoder.layer.{i}"
        lyr = {
            "norm1_scale": g(f"{b}.norm1.weight").astype(f32),
            "norm1_bias": g(f"{b}.norm1.bias").astype(f32),
            "q": {"w": g(f"{b}.attention.attention.query.weight").T.astype(dtype),
                  "b": g(f"{b}.attention.attention.query.bias").astype(dtype)},
            "k": {"w": g(f"{b}.attention.attention.key.weight").T.astype(dtype),
                  "b": g(f"{b}.attention.attention.key.bias").astype(dtype)},
            "v": {"w": g(f"{b}.attention.attention.value.weight").T.astype(dtype),
                  "b": g(f"{b}.attention.attention.value.bias").astype(dtype)},
            "out": {"w": g(f"{b}.attention.output.dense.weight").T.astype(dtype),
                    "b": g(f"{b}.attention.output.dense.bias").astype(dtype)},
            "ls1": g(f"{b}.layer_scale1.lambda1").astype(f32),
            "norm2_scale": g(f"{b}.norm2.weight").astype(f32),
            "norm2_bias": g(f"{b}.norm2.bias").astype(f32),
            "ls2": g(f"{b}.layer_scale2.lambda1").astype(f32),
        }
        if cfg.use_swiglu_ffn:
            lyr["ffn_in"] = {"w": g(f"{b}.mlp.weights_in.weight").T.astype(dtype),
                             "b": g(f"{b}.mlp.weights_in.bias").astype(dtype)}
            lyr["ffn_out"] = {"w": g(f"{b}.mlp.weights_out.weight").T.astype(dtype),
                              "b": g(f"{b}.mlp.weights_out.bias").astype(dtype)}
        else:
            lyr["ffn_in"] = {"w": g(f"{b}.mlp.fc1.weight").T.astype(dtype),
                             "b": g(f"{b}.mlp.fc1.bias").astype(dtype)}
            lyr["ffn_out"] = {"w": g(f"{b}.mlp.fc2.weight").T.astype(dtype),
                              "b": g(f"{b}.mlp.fc2.bias").astype(dtype)}
        layers.append(lyr)
    return {
        "cls_token": g("embeddings.cls_token").astype(f32),
        "pos_embed": g("embeddings.position_embeddings").astype(f32),
        "patch_proj": {"w": patch_w,
                       "b": g("embeddings.patch_embeddings.projection.bias").astype(dtype)},
        "layers": _stack(layers),
        "final_norm_scale": g("layernorm.weight").astype(f32),
        "final_norm_bias": g("layernorm.bias").astype(f32),
    }


def map_clip_vit(sd: Dict[str, np.ndarray], cfg, dtype=np.float32,
                 prefix: str = "vision_model.") -> dict:
    """Map an HF CLIPVisionModel state dict onto models/clip_vit.py params."""
    dtype = _resolve_dtype(dtype)
    f32 = np.float32

    def g(k):
        return sd[prefix + k] if prefix + k in sd else sd[k]

    conv_w = g("embeddings.patch_embedding.weight")          # [H,3,p,p]
    h = conv_w.shape[0]
    layers = []
    for i in range(cfg.num_layers):
        b = f"encoder.layers.{i}"
        layers.append({
            "ln1_scale": g(f"{b}.layer_norm1.weight").astype(f32),
            "ln1_bias": g(f"{b}.layer_norm1.bias").astype(f32),
            "q": _lin(sd, prefix + f"{b}.self_attn.q_proj", dtype),
            "k": _lin(sd, prefix + f"{b}.self_attn.k_proj", dtype),
            "v": _lin(sd, prefix + f"{b}.self_attn.v_proj", dtype),
            "out": _lin(sd, prefix + f"{b}.self_attn.out_proj", dtype),
            "ln2_scale": g(f"{b}.layer_norm2.weight").astype(f32),
            "ln2_bias": g(f"{b}.layer_norm2.bias").astype(f32),
            "fc1": _lin(sd, prefix + f"{b}.mlp.fc1", dtype),
            "fc2": _lin(sd, prefix + f"{b}.mlp.fc2", dtype),
        })
    return {
        "class_embedding": g("embeddings.class_embedding").astype(f32),
        "pos_embed": g("embeddings.position_embedding.weight").astype(f32),
        "patch_proj": {"w": conv_w.reshape(h, -1).T.astype(dtype)},
        "pre_ln_scale": g("pre_layrnorm.weight").astype(f32),
        "pre_ln_bias": g("pre_layrnorm.bias").astype(f32),
        "layers": _stack(layers),
    }


def load_paint_pipeline(model_path: str, view_size: int = 512, dtype="bf16"):
    """Load a HunyuanPaint checkpoint directory (diffusers layout:
    unet/config.json + diffusion_pytorch_model.bin, vae/..., parity:
    unet/modules.py:422-434). Local path or $HY3DGEN_MODELS; falls back to
    HF snapshot_download."""
    import json

    from hunyuan3d2_tpu.io import diffusers_maps as dm
    from hunyuan3d2_tpu.models import paint_unet, sd_vae
    from hunyuan3d2_tpu.pipelines.hunyuanpaint import HunyuanPaintPipeline

    base = os.path.expanduser(os.environ.get("HY3DGEN_MODELS", "~/.cache/hy3dgen"))
    candidates = [model_path, os.path.join(base, model_path)]
    root = next((d for d in candidates
                 if os.path.isdir(os.path.join(d, "unet"))), None)
    if root is None:
        try:
            from huggingface_hub import snapshot_download

            root = snapshot_download(repo_id=model_path)
        except Exception as e:
            raise FileNotFoundError(
                f"paint checkpoint not found at {model_path} "
                f"(HY3DGEN_MODELS={base}); hub download failed: {e}. "
                "Use HunyuanPaintPipeline.init_random for weight-free runs.")

    with open(os.path.join(root, "unet", "config.json")) as fh:
        ucfg_json = json.load(fh)
    ucfg = paint_unet.PaintUNetConfig(
        in_channels=12,
        out_channels=ucfg_json.get("out_channels", 4),
        block_out_channels=tuple(ucfg_json.get("block_out_channels",
                                               (320, 640, 1280, 1280))),
        layers_per_block=ucfg_json.get("layers_per_block", 2),
        cross_attention_dim=ucfg_json.get("cross_attention_dim", 1024),
        attention_head_dim=64,
        norm_num_groups=ucfg_json.get("norm_num_groups", 32),
    )
    for name in ("diffusion_pytorch_model.bin", "diffusion_pytorch_model.safetensors"):
        unet_ckpt = os.path.join(root, "unet", name)
        if os.path.exists(unet_ckpt):
            break
    unet_params = dm.map_paint_unet(load_state_dict(unet_ckpt), ucfg, dtype)

    vcfg_path = os.path.join(root, "vae", "config.json")
    vcfg_json = json.load(open(vcfg_path)) if os.path.exists(vcfg_path) else {}
    vcfg = sd_vae.SDVAEConfig(
        latent_channels=vcfg_json.get("latent_channels", 4),
        block_out_channels=tuple(vcfg_json.get("block_out_channels",
                                               (128, 256, 512, 512))),
        layers_per_block=vcfg_json.get("layers_per_block", 2),
        scaling_factor=vcfg_json.get("scaling_factor", 0.18215),
    )
    for name in ("diffusion_pytorch_model.bin", "diffusion_pytorch_model.safetensors"):
        vae_ckpt = os.path.join(root, "vae", name)
        if os.path.exists(vae_ckpt):
            break
    vae_params = dm.map_sd_vae(load_state_dict(vae_ckpt), vcfg, dtype)

    return HunyuanPaintPipeline(unet_params, ucfg, vae_params, vcfg,
                                view_size=view_size)


# ---------------------------------------------------------------------------
# full pipeline assembly from a reference checkpoint layout
# ---------------------------------------------------------------------------
def load_pipeline(cls, model_path: str, subfolder: str, variant: str = "fp16",
                  dtype="bf16", **kwargs):
    cfg_path, ckpt_path = smart_load_model(model_path, subfolder, variant)
    return load_pipeline_single_file(cls, ckpt_path, cfg_path, dtype=dtype, **kwargs)


def load_pipeline_single_file(cls, ckpt_path: str, config_path: str,
                              dtype="bf16", **kwargs):
    import yaml

    from hunyuan3d2_tpu.models import conditioner as cond_lib
    from hunyuan3d2_tpu.models import dinov2, dit as dit_lib, shapevae as vae_lib
    from hunyuan3d2_tpu.pipelines import schedulers as sched_lib

    with open(config_path) as fh:
        config = yaml.safe_load(fh)
    sd_all = split_by_top_key(load_state_dict(ckpt_path))

    def params_of(section):
        return (config.get(section, {}) or {}).get("params", {}) or {}

    mp = params_of("model")
    dit_cfg = dit_lib.DiTConfig(
        in_channels=mp.get("in_channels", 64),
        context_in_dim=mp.get("context_in_dim", 1536),
        hidden_size=mp.get("hidden_size", 1024),
        mlp_ratio=mp.get("mlp_ratio", 4.0),
        num_heads=mp.get("num_heads", 16),
        depth=mp.get("depth", 16),
        depth_single_blocks=mp.get("depth_single_blocks", 32),
        qkv_bias=mp.get("qkv_bias", True),
        guidance_embed=mp.get("guidance_embed", False),
    )
    dit_params = map_dit(sd_all["model"], dit_cfg, dtype)

    vp = params_of("vae")
    vae_cfg = vae_lib.ShapeVAEConfig(
        num_latents=vp.get("num_latents", 512),
        embed_dim=vp.get("embed_dim", 64),
        width=vp.get("width", 1024),
        heads=vp.get("heads", 16),
        num_decoder_layers=vp.get("num_decoder_layers", 16),
        num_freqs=vp.get("num_freqs", 8),
        include_pi=vp.get("include_pi", False),
        scale_factor=vp.get("scale_factor", 1.0188137142395404),
        qkv_bias=vp.get("qkv_bias", False),
    )
    vae = vae_lib.ShapeVAE(map_shapevae(sd_all["vae"], vae_cfg, dtype), vae_cfg)

    # conditioner: main_image_encoder config nested under conditioner params
    cp = params_of("conditioner")
    enc_cfg_dict = ((cp.get("main_image_encoder") or {}).get("kwargs") or {}).get("config") or {}
    dcfg = dinov2.DinoConfig(
        hidden_size=enc_cfg_dict.get("hidden_size", 1536),
        num_layers=enc_cfg_dict.get("num_hidden_layers", 40),
        num_heads=enc_cfg_dict.get("num_attention_heads", 24),
        patch_size=enc_cfg_dict.get("patch_size", 14),
        image_size=((cp.get("main_image_encoder") or {}).get("kwargs") or {}).get("image_size", 518),
        use_swiglu_ffn=enc_cfg_dict.get("use_swiglu_ffn", True),
    )
    cond_sd = sd_all.get("conditioner", {})
    enc_cfg = cond_lib.DinoEncoderConfig(dino=dcfg, image_size=dcfg.image_size)
    dino_params = map_dinov2(cond_sd, dcfg, dtype, prefix="main_image_encoder.model.")
    target = str((config.get("conditioner") or {}).get("target", ""))
    main_type = str((cp.get("main_image_encoder") or {}).get("type", ""))
    if "MV" in target or "MV" in main_type or "mv" in (config.get("name") or ""):
        main = cond_lib.DinoImageEncoderMV(dino_params, enc_cfg)
    else:
        main = cond_lib.DinoImageEncoder(dino_params, enc_cfg)
    add_cfg_dict = cp.get("additional_image_encoder") or {}
    if "DualImageEncoder" in target or add_cfg_dict:
        # v2-0 standard checkpoints: additional CLIP tower
        # (reference conditioner.py:214, build_image_encoder :203)
        from hunyuan3d2_tpu.models import clip_vit

        ak = add_cfg_dict.get("kwargs") or {}
        ac = ak.get("config") or {}
        ccfg = clip_vit.CLIPVisionConfig(
            hidden_size=ac.get("hidden_size", 1024),
            num_layers=ac.get("num_hidden_layers", 24),
            num_heads=ac.get("num_attention_heads", 16),
            patch_size=ac.get("patch_size", 14),
            image_size=ak.get("image_size", 224),
            intermediate_size=ac.get("intermediate_size", 4096),
        )
        clip_params = map_clip_vit(
            cond_sd, ccfg, _resolve_dtype(dtype),
            prefix="additional_image_encoder.model.vision_model.")
        additional = clip_vit.CLIPImageEncoder(clip_params, ccfg)
        conditioner = cond_lib.DualImageEncoder(main, additional)
    else:
        conditioner = cond_lib.SingleImageEncoder(main)

    st = str((config.get("scheduler") or {}).get("target", "FlowMatchEulerDiscreteScheduler"))
    sp = params_of("scheduler")
    name = st.rsplit(".", 1)[-1]
    sched_cls = sched_lib.SCHEDULERS.get(name, sched_lib.FlowMatchEulerDiscreteScheduler)
    scheduler = sched_cls(**{k: v for k, v in sp.items()
                             if k in sched_cls.__dataclass_fields__})

    return cls(vae=vae, model_params=dit_params, model_cfg=dit_cfg,
               scheduler=scheduler, conditioner=conditioner, **kwargs)
