"""Direct-execution parity against the ACTUAL reference code.

Unlike tests/test_models_parity.py (which compares against hand-written
torch twins — the builder grading their own homework), these tests load the
real modules from /root/reference by file path (tests/ref_loader.py),
initialize them with random torch weights, ingest those exact state dicts
through the production mapper (io/checkpoints.py), and assert the JAX models
reproduce the reference forward outputs. Components covered (everything the
image's dependencies allow — diffusers/torchvision/skimage are absent):

* Hunyuan3DDiT.forward (hy3dgen/shapegen/models/denoisers/hunyuan3ddit.py:381),
  standard + guidance-embed variants
* ShapeVAE decode path built from the reference attention_blocks.py classes
  (post_kl + Transformer :397 + CrossAttentionDecoder :435, wired per
  autoencoders/model.py:130-186)
* DINOv2 vs the actual ``transformers.Dinov2Model`` the reference conditioner
  wraps (conditioner.py:127-133)
* ImageProcessorV2 recenter geometry (preprocessors.py:30-117)
* Both schedulers executed via a minimal diffusers shim
  (schedulers.py:181-318 FlowMatch; :330-480 Consistency/PCM)
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from tests.ref_loader import diffusers_shim, load_ref
from hunyuan3d2_tpu.io import checkpoints
from hunyuan3d2_tpu.models import dinov2, dit, shapevae


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _tree_f32(params):
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float32),
                        params)


# --------------------------------------------------------------------------
# DiT
# --------------------------------------------------------------------------

def _ref_dit(**kw):
    mod = load_ref("hy3dgen.shapegen.models.denoisers.hunyuan3ddit")
    torch.manual_seed(kw.pop("seed", 0))
    return mod.Hunyuan3DDiT(**kw).eval()


def test_reference_dit_forward_parity():
    tm = _ref_dit(in_channels=8, context_in_dim=16, hidden_size=64,
                  num_heads=2, depth=2, depth_single_blocks=2, axes_dim=[32])
    cfg = dit.DiTConfig(in_channels=8, context_in_dim=16, hidden_size=64,
                        num_heads=2, depth=2, depth_single_blocks=2)
    params = _tree_f32(checkpoints.map_dit(_sd(tm), cfg, np.float32))

    rs = np.random.RandomState(0)
    x = rs.randn(2, 6, 8).astype(np.float32)
    t = np.array([0.25, 0.75], np.float32)
    cond = rs.randn(2, 10, 16).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(t),
                 {"main": torch.tensor(cond)}).numpy()
    ours = np.asarray(dit.apply(params, cfg, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(cond)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_reference_dit_guidance_embed_parity():
    tm = _ref_dit(seed=1, in_channels=8, context_in_dim=16, hidden_size=64,
                  num_heads=2, depth=1, depth_single_blocks=1, axes_dim=[32],
                  guidance_embed=True)
    cfg = dit.DiTConfig(in_channels=8, context_in_dim=16, hidden_size=64,
                        num_heads=2, depth=1, depth_single_blocks=1,
                        guidance_embed=True)
    params = _tree_f32(checkpoints.map_dit(_sd(tm), cfg, np.float32))
    rs = np.random.RandomState(1)
    x = rs.randn(1, 6, 8).astype(np.float32)
    t = np.array([0.5], np.float32)
    cond = rs.randn(1, 10, 16).astype(np.float32)
    g = np.array([5.0], np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(t),
                 {"main": torch.tensor(cond)},
                 guidance=torch.tensor(g)).numpy()
    ours = np.asarray(dit.apply(params, cfg, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(cond), jnp.asarray(g)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# ShapeVAE decode (reference attention_blocks classes, model.py wiring)
# --------------------------------------------------------------------------

def test_reference_shapevae_decode_parity():
    ab = load_ref("hy3dgen.shapegen.models.autoencoders.attention_blocks")
    nn = torch.nn
    num_latents, embed_dim, width, heads, layers = 5, 8, 32, 2, 2

    class RefVAE(nn.Module):
        """ShapeVAE decode path with the exact field names of
        autoencoders/model.py:130-186 (so state-dict keys match)."""

        def __init__(self):
            super().__init__()
            # production VAE config: num_freqs 8, include_pi false (the
            # delldu spec, project/image3d/shape.py:36-37)
            self.fourier_embedder = ab.FourierEmbedder(num_freqs=8,
                                                       include_pi=False)
            self.post_kl = nn.Linear(embed_dim, width)
            # production VAE config uses qk_norm: true (the delldu spec,
            # project/image3d/shape.py:42)
            self.transformer = ab.Transformer(
                n_ctx=num_latents, width=width, layers=layers, heads=heads,
                qkv_bias=True, qk_norm=True)
            self.geo_decoder = ab.CrossAttentionDecoder(
                fourier_embedder=self.fourier_embedder, out_channels=1,
                num_latents=num_latents, mlp_expand_ratio=4,
                downsample_ratio=1, enable_ln_post=True, width=width,
                heads=heads, qkv_bias=True, qk_norm=True,
                label_type="binary")

        def forward(self, latents, queries):
            h = self.transformer(self.post_kl(latents))
            return self.geo_decoder(queries=queries, latents=h)

    torch.manual_seed(2)
    tm = RefVAE().eval()
    # scale_factor=1: RefVAE.forward has no latent rescale (that lives in
    # the reference pipeline, pipelines.py:654), ours folds it into
    # decode_latents
    cfg = shapevae.ShapeVAEConfig(num_latents=num_latents,
                                  embed_dim=embed_dim, width=width,
                                  heads=heads, num_decoder_layers=layers,
                                  scale_factor=1.0)
    params = _tree_f32(checkpoints.map_shapevae(_sd(tm), cfg, np.float32))

    rs = np.random.RandomState(2)
    latents = rs.randn(1, num_latents, embed_dim).astype(np.float32)
    queries = rs.uniform(-1.01, 1.01, (1, 17, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(latents), torch.tensor(queries)).numpy()[..., 0]
    hidden = shapevae.decode_latents(params, cfg, jnp.asarray(latents))
    kv = shapevae.compute_kv(params, cfg, hidden)
    ours = np.asarray(shapevae.decode_queries(params, cfg,
                                              jnp.asarray(queries), kv))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


# --------------------------------------------------------------------------
# DINOv2 vs the actual transformers model the conditioner wraps
# --------------------------------------------------------------------------

def test_reference_dinov2_vs_transformers_model():
    transformers = pytest.importorskip("transformers")
    tcfg = transformers.Dinov2Config(
        image_size=56, patch_size=14, num_channels=3, hidden_size=48,
        num_hidden_layers=2, num_attention_heads=4, mlp_ratio=4,
        use_swiglu_ffn=True, layerscale_value=1.0)
    torch.manual_seed(3)
    tm = transformers.Dinov2Model(tcfg).eval()
    sd = _sd(tm)
    swiglu_hidden = sd["encoder.layer.0.mlp.weights_out.weight"].shape[1]
    cfg = dinov2.DinoConfig(hidden_size=48, num_layers=2, num_heads=4,
                            patch_size=14, image_size=56,
                            swiglu_hidden=swiglu_hidden, use_swiglu_ffn=True)
    params = _tree_f32(checkpoints.map_dinov2(sd, cfg, np.float32, prefix=""))

    rs = np.random.RandomState(3)
    img = rs.randn(2, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(img.transpose(0, 3, 1, 2))
                 ).last_hidden_state.numpy()
    ours = np.asarray(dinov2.apply(params, cfg, jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)


# --------------------------------------------------------------------------
# Image preprocessor (recenter geometry + pixel agreement)
# --------------------------------------------------------------------------

def test_reference_preprocessor_parity():
    pytest.importorskip("cv2")
    from PIL import Image

    from hunyuan3d2_tpu.utils import imageproc

    pre = load_ref("hy3dgen.shapegen.preprocessors")
    rs = np.random.RandomState(0)
    # smooth object off-center: a filled disc with a radial gradient
    h, w = 300, 400
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.sqrt((yy - 110) ** 2 + (xx - 260) ** 2)
    alpha = (r < 80).astype(np.uint8) * 255
    rgba = np.zeros((h, w, 4), np.uint8)
    for c in range(3):
        rgba[..., c] = np.clip(255 - r * (0.5 + 0.3 * c), 0, 255)
    rgba[..., 3] = alpha
    img = Image.fromarray(rgba, "RGBA")

    ref_out = pre.ImageProcessorV2(size=512)(img, border_ratio=0.15,
                                             to_tensor=True)
    ref_img = ref_out["image"].numpy()[0].transpose(1, 2, 0)   # [512,512,3]
    ref_mask = ref_out["mask"].numpy()[0, 0]                   # [512,512]

    ours = imageproc.ImageProcessorV2(size=512)(img, border_ratio=0.15)
    our_img = ours["image"][0]
    our_mask = ours["mask"][0, ..., 0]

    # geometry: object bbox in the mask must agree within 2 px (catches
    # recenter-span/scale bugs — the class PARITY.md caught by hand)
    def bbox(m):
        ys, xs = np.nonzero(m > 0)
        return np.array([ys.min(), ys.max(), xs.min(), xs.max()])

    assert np.abs(bbox(ref_mask) - bbox(our_mask)).max() <= 2
    # pixel values: different resamplers (cv2 INTER_AREA+CUBIC vs PIL
    # BILINEAR) → compare loosely away from edges
    interior = (ref_mask > 0.99) & (our_mask > 0.99)
    assert interior.mean() > 0.05
    assert np.abs(ref_img - our_img)[interior].mean() < 0.02
    # background is white in both — away from the silhouette. (The reference
    # composites over white BEFORE its final INTER_CUBIC image resize while
    # the mask upscales with INTER_NEAREST, so pixels just outside the mask
    # edge legitimately keep object color, preprocessors.py:83-102.)
    import cv2 as _cv2

    outside = (ref_mask < -0.99) & (our_mask < -0.99)
    far_outside = _cv2.erode(outside.astype(np.uint8),
                             np.ones((9, 9), np.uint8)).astype(bool)
    assert far_outside.sum() > 1000
    np.testing.assert_allclose(our_img[far_outside], 1.0, atol=1e-2)
    np.testing.assert_allclose(ref_img[far_outside], 1.0, atol=1e-2)


# --------------------------------------------------------------------------
# Schedulers (executed through a minimal diffusers shim)
# --------------------------------------------------------------------------

def test_reference_flowmatch_scheduler_parity():
    from hunyuan3d2_tpu.pipelines import schedulers as ours

    with diffusers_shim():
        mod = load_ref("hy3dgen.shapegen.schedulers")
        for shift in (1.0, 3.0):
            ref = mod.FlowMatchEulerDiscreteScheduler(shift=shift)
            # production call (pipelines.py:732): sigmas = linspace(0,1,N)
            n = 5
            ref.set_timesteps(sigmas=np.linspace(0.0, 1.0, n))
            mine = ours.FlowMatchEulerDiscreteScheduler(shift=shift)
            sig = mine.make_sigmas(n)
            np.testing.assert_allclose(sig, ref.sigmas.numpy(), atol=1e-7)
            np.testing.assert_allclose(mine.timesteps(sig),
                                       ref.timesteps.numpy(), atol=1e-4)
            # walk the whole ladder through step()
            rs = np.random.RandomState(0)
            x_ref = rs.randn(1, 4, 3).astype(np.float32)
            x_our = x_ref.copy()
            for i, t in enumerate(ref.timesteps):
                v = rs.randn(1, 4, 3).astype(np.float32)
                x_ref = ref.step(torch.tensor(v), t,
                                 torch.tensor(x_ref)).prev_sample.numpy()
                x_our = ours.FlowMatchEulerDiscreteScheduler.step(
                    x_our, v, sig[i], sig[i + 1])
            np.testing.assert_allclose(x_our, x_ref, atol=1e-5)


def test_reference_consistency_scheduler_parity():
    from hunyuan3d2_tpu.pipelines import schedulers as ours

    with diffusers_shim():
        mod = load_ref("hy3dgen.shapegen.schedulers")
        for n in (1, 2, 5, 10):
            ref = mod.ConsistencyFlowMatchEulerDiscreteScheduler()
            ref.set_timesteps(num_inference_steps=n)
            mine = ours.ConsistencyFlowMatchEulerDiscreteScheduler()
            sig = mine.make_sigmas(n)
            np.testing.assert_allclose(sig, ref.sigmas_.numpy(), atol=1e-7)
            np.testing.assert_allclose(mine.timesteps(sig),
                                       ref.timesteps.numpy(), atol=1e-4)
            rs = np.random.RandomState(n)
            x_ref = rs.randn(1, 4, 3).astype(np.float32)
            x_our = x_ref.copy()
            for i, t in enumerate(ref.timesteps):
                v = rs.randn(1, 4, 3).astype(np.float32)
                out = ref.step(torch.tensor(v), t, torch.tensor(x_ref))
                np.testing.assert_allclose(
                    ours.ConsistencyFlowMatchEulerDiscreteScheduler.pred_original(
                        x_ref, v, sig[i]),
                    out.pred_original_sample.numpy(), atol=1e-5)
                x_ref = out.prev_sample.numpy()
                x_our = ours.ConsistencyFlowMatchEulerDiscreteScheduler.step(
                    x_our, v, sig[i], sig[i + 1])
            np.testing.assert_allclose(x_our, x_ref, atol=1e-5)
