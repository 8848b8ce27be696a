"""Checkpoint ingestion dress rehearsal at PRODUCTION layout (VERDICT r3 #7).

Builds a checkpoint exactly the way the reference ships them — config.yaml
with the reference ``target:`` strings, ``model.fp16.safetensors`` holding
the state dicts of the ACTUAL reference torch modules (hunyuan3ddit.py
Hunyuan3DDiT, attention_blocks.py VAE stack, transformers Dinov2Model) under
the single-file top-level key-split layout (reference pipelines.py:157-167)
— then drives the production load path:

    from_pretrained → generate → GLB on disk

and asserts fp32 forward parity of every loaded tower against the reference
modules reloaded from the same fp16 file. Zero egress blocks the real 0.6B
weights, but after this test they are a drop-in: same classes, same key
layout, same split/remap/cast path. A second checkpoint exercises the
DeepSpeed '_forward_module.' remap (hunyuan3ddit.py:361-377) through the
torch-ckpt branch of the loader.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
import jax.numpy as jnp
import yaml
from PIL import Image

from tests.ref_loader import load_ref
from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

DIT_KW = dict(in_channels=8, context_in_dim=48, hidden_size=64, num_heads=2,
              depth=2, depth_single_blocks=2, qkv_bias=True,
              guidance_embed=False)
VAE_KW = dict(num_latents=16, embed_dim=8, width=32, heads=2,
              num_decoder_layers=2, num_freqs=8, include_pi=False,
              scale_factor=1.0188137142395404)
DINO_KW = dict(hidden_size=48, num_hidden_layers=1, num_attention_heads=4,
               patch_size=14, use_swiglu_ffn=True)


def _ref_modules(seed=0):
    """The actual reference classes, at CPU-sized dims, production wiring."""
    hd = load_ref("hy3dgen.shapegen.models.denoisers.hunyuan3ddit")
    ab = load_ref("hy3dgen.shapegen.models.autoencoders.attention_blocks")
    import transformers

    torch.manual_seed(seed)
    dit = hd.Hunyuan3DDiT(axes_dim=[32], **DIT_KW).eval()

    nn = torch.nn

    class RefVAE(nn.Module):
        """ShapeVAE decode path with the exact field names of
        autoencoders/model.py:130-186 → production state-dict keys."""

        def __init__(self):
            super().__init__()
            self.fourier_embedder = ab.FourierEmbedder(num_freqs=8,
                                                       include_pi=False)
            self.post_kl = nn.Linear(VAE_KW["embed_dim"], VAE_KW["width"])
            self.transformer = ab.Transformer(
                n_ctx=VAE_KW["num_latents"], width=VAE_KW["width"],
                layers=VAE_KW["num_decoder_layers"], heads=VAE_KW["heads"],
                qkv_bias=True, qk_norm=True)
            self.geo_decoder = ab.CrossAttentionDecoder(
                fourier_embedder=self.fourier_embedder, out_channels=1,
                num_latents=VAE_KW["num_latents"], mlp_expand_ratio=4,
                downsample_ratio=1, enable_ln_post=True,
                width=VAE_KW["width"], heads=VAE_KW["heads"], qkv_bias=True,
                qk_norm=True, label_type="binary")

        def forward(self, latents, queries):
            h = self.transformer(self.post_kl(latents / VAE_KW["scale_factor"]))
            return self.geo_decoder(queries=queries, latents=h)

    vae = RefVAE().eval()
    dino = transformers.Dinov2Model(transformers.Dinov2Config(
        image_size=56, num_channels=3, mlp_ratio=4, layerscale_value=1.0,
        **DINO_KW)).eval()
    return dit, vae, dino


def _production_config():
    return {
        "name": "dress-rehearsal-mini",
        "model": {
            "target": "hy3dgen.shapegen.models.Hunyuan3DDiT",
            "params": dict(DIT_KW),
        },
        "vae": {
            "target": "hy3dgen.shapegen.models.ShapeVAE",
            "params": dict(VAE_KW),
        },
        "conditioner": {
            "target": "hy3dgen.shapegen.models.conditioner.SingleImageEncoder",
            "params": {"main_image_encoder": {
                "type": "DinoImageEncoder",
                "kwargs": {"config": dict(DINO_KW), "image_size": 56}}},
        },
        "scheduler": {
            "target": "hy3dgen.shapegen.schedulers.FlowMatchEulerDiscreteScheduler",
            "params": {"num_train_timesteps": 1000},
        },
        "image_processor": {
            "target": "hy3dgen.shapegen.preprocessors.ImageProcessorV2",
            "params": {"size": 512, "border_ratio": 0.15},
        },
    }


def _split_sd_fp16(dit, vae, dino):
    """Single-file layout: top-level key prefix per tower (reference
    pipelines.py:157-167), fp16 like the shipped model.fp16.safetensors."""
    sd = {}
    for prefix, module in (("model", dit), ("vae", vae)):
        for k, v in module.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy().astype(np.float16)
    for k, v in dino.state_dict().items():
        sd[f"conditioner.main_image_encoder.model.{k}"] = \
            v.detach().numpy().astype(np.float16)
    return sd


def _reload_fp16(module, sd, prefix):
    """Load the fp16 tensors back into the torch module (fp32 params receive
    casts) so both frameworks compute from IDENTICAL weights."""
    sub = {k[len(prefix):]: torch.tensor(v.astype(np.float32))
           for k, v in sd.items() if k.startswith(prefix)}
    module.load_state_dict(sub, strict=True)
    return module


@pytest.mark.filterwarnings("ignore")
def test_production_layout_checkpoint_end_to_end(tmp_path):
    dit, vae, dino = _ref_modules()
    sd = _split_sd_fp16(dit, vae, dino)
    sub = os.path.join(str(tmp_path), "hunyuan3d-dit-v2-mini")
    os.makedirs(sub)
    from safetensors.numpy import save_file

    save_file(sd, os.path.join(sub, "model.fp16.safetensors"))
    with open(os.path.join(sub, "config.yaml"), "w") as fh:
        yaml.safe_dump(_production_config(), fh)

    pipe = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        str(tmp_path), subfolder="hunyuan3d-dit-v2-mini", dtype=np.float32)
    assert pipe.model_cfg.hidden_size == 64
    assert pipe.vae.cfg.num_latents == 16

    # --- fp32 forward parity vs the reference modules (same fp16 weights) --
    _reload_fp16(dit, sd, "model.")
    _reload_fp16(vae, sd, "vae.")
    _reload_fp16(dino, sd, "conditioner.main_image_encoder.model.")

    rs = np.random.RandomState(0)
    x = rs.randn(2, 6, 8).astype(np.float32)
    t = np.array([0.25, 0.75], np.float32)
    cond = rs.randn(2, 10, 48).astype(np.float32)
    with torch.no_grad():
        ref_dit = dit(torch.tensor(x), torch.tensor(t),
                      {"main": torch.tensor(cond)}).numpy()
    from hunyuan3d2_tpu.models import dinov2 as dino_lib
    from hunyuan3d2_tpu.models import dit as dit_lib
    from hunyuan3d2_tpu.models import shapevae as sv

    ours_dit = np.asarray(dit_lib.apply(
        pipe.model_params, pipe.model_cfg, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(cond)))
    np.testing.assert_allclose(ours_dit, ref_dit, atol=5e-4, rtol=1e-3)

    latents = rs.randn(1, 16, 8).astype(np.float32)
    queries = rs.uniform(-1.01, 1.01, (1, 33, 3)).astype(np.float32)
    with torch.no_grad():
        ref_occ = vae(torch.tensor(latents),
                      torch.tensor(queries)).numpy()[..., 0]
    hidden = sv.decode_latents(pipe.vae.params, pipe.vae.cfg,
                               jnp.asarray(latents))
    kv = sv.compute_kv(pipe.vae.params, pipe.vae.cfg, hidden)
    ours_occ = np.asarray(sv.decode_queries(pipe.vae.params, pipe.vae.cfg,
                                            jnp.asarray(queries), kv))
    np.testing.assert_allclose(ours_occ, ref_occ, atol=5e-4, rtol=1e-3)

    img = rs.randn(2, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        ref_hid = dino(torch.tensor(img.transpose(0, 3, 1, 2))
                       ).last_hidden_state.numpy()
    enc = pipe.conditioner.main
    ours_hid = np.asarray(dino_lib.apply(enc.params, enc.cfg.dino,
                                         jnp.asarray(img)))
    np.testing.assert_allclose(ours_hid, ref_hid, atol=1e-3, rtol=1e-3)

    # --- generate → GLB on disk (the production serving flow) -------------
    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[16:48, 16:48] = [120, 180, 60, 255]
    mesh = pipe(image=Image.fromarray(rgba), num_inference_steps=2,
                octree_resolution=32, seed=3)[0]
    assert mesh is not None and len(mesh.vertices) > 0
    glb = os.path.join(str(tmp_path), "rehearsal.glb")
    mesh.export(glb)
    assert os.path.getsize(glb) > 1000


@pytest.mark.filterwarnings("ignore")
def test_deepspeed_checkpoint_remap(tmp_path):
    """DeepSpeed-trained single-file ckpt ('_forward_module.model.' prefixes,
    torch .ckpt container — reference remap at hunyuan3ddit.py:361-377):
    the loader must strip the wrapper and land the same weights."""
    dit, vae, dino = _ref_modules(seed=2)
    sd = _split_sd_fp16(dit, vae, dino)
    wrapped = {f"_forward_module.{k}": torch.tensor(v.astype(np.float32))
               for k, v in sd.items()}
    sub = os.path.join(str(tmp_path), "hunyuan3d-dit-v2-ds")
    os.makedirs(sub)
    torch.save(wrapped, os.path.join(sub, "model.fp16.ckpt"))
    with open(os.path.join(sub, "config.yaml"), "w") as fh:
        yaml.safe_dump(_production_config(), fh)

    pipe = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        str(tmp_path), subfolder="hunyuan3d-dit-v2-ds", dtype=np.float32)
    _reload_fp16(dit, sd, "model.")
    rs = np.random.RandomState(1)
    x = rs.randn(1, 6, 8).astype(np.float32)
    t = np.array([0.5], np.float32)
    cond = rs.randn(1, 10, 48).astype(np.float32)
    with torch.no_grad():
        ref = dit(torch.tensor(x), torch.tensor(t),
                  {"main": torch.tensor(cond)}).numpy()
    from hunyuan3d2_tpu.models import dit as dit_lib

    ours = np.asarray(dit_lib.apply(pipe.model_params, pipe.model_cfg,
                                    jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(cond)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.filterwarnings("ignore")
def test_nested_pipeline_ckpt_format(tmp_path):
    """The reference's torch-container single-file format is NESTED —
    {model: sd, vae: sd, conditioner: sd} (pipelines.py:168-177 indexes
    ckpt['model'] etc.) — with possible DeepSpeed wrappers inside each
    sub-dict. The loader must flatten it to the same result."""
    dit, vae, dino = _ref_modules(seed=3)
    sd = _split_sd_fp16(dit, vae, dino)
    nested = {"model": {}, "vae": {}, "conditioner": {}}
    for k, v in sd.items():
        top, rest = k.split(".", 1)
        # DeepSpeed wrapper inside the model sub-dict
        if top == "model":
            rest = f"_forward_module.{rest}"
        nested[top][rest] = torch.tensor(v.astype(np.float32))
    sub = os.path.join(str(tmp_path), "hunyuan3d-dit-v2-nested")
    os.makedirs(sub)
    torch.save(nested, os.path.join(sub, "model.fp16.ckpt"))
    with open(os.path.join(sub, "config.yaml"), "w") as fh:
        yaml.safe_dump(_production_config(), fh)

    pipe = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
        str(tmp_path), subfolder="hunyuan3d-dit-v2-nested", dtype=np.float32)
    _reload_fp16(dit, sd, "model.")
    rs = np.random.RandomState(2)
    x = rs.randn(1, 6, 8).astype(np.float32)
    t = np.array([0.3], np.float32)
    cond = rs.randn(1, 10, 48).astype(np.float32)
    with torch.no_grad():
        ref = dit(torch.tensor(x), torch.tensor(t),
                  {"main": torch.tensor(cond)}).numpy()
    from hunyuan3d2_tpu.models import dit as dit_lib

    ours = np.asarray(dit_lib.apply(pipe.model_params, pipe.model_cfg,
                                    jnp.asarray(x), jnp.asarray(t),
                                    jnp.asarray(cond)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
