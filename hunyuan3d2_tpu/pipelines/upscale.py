"""JAX-native x4 super-resolution diffusion pipeline.

Behavioral parity: reference hy3dgen/texgen/utils/imagesuper_utils.py
Image_Super_Net (:19-34) — diffusers StableDiffusionUpscalePipeline
('stabilityai/stable-diffusion-x4-upscaler'), 5 inference steps, empty
prompt. Flow (pipeline_stable_diffusion_upscale.py): the low-res image in
[-1,1] is DDPM-noised at ``noise_level`` (default 20) and concatenated in
PIXEL space onto the 4 noise latents (7-channel conv_in); the noise level is
fed to the UNet as a class label; 2-way CFG; f=4 VAE decode gives the 4×
output. The reference fork disables the stage (texgen/pipelines.py:238);
this module makes it runnable on TPU when a checkpoint is provided
(VERDICT r2 missing #4, second priority after delight).

TPU-first: whole loop one jitted ``lax.scan`` over the CFG pair; bf16
matmuls, fp32 norms, NHWC. Exact scheduler/UNet hyper-parameters load from
the checkpoint's config.json files (zero-egress here, so the defaults are
best-effort SD2.x-era values validated only structurally).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from hunyuan3d2_tpu.models import paint_unet, sd_vae
from hunyuan3d2_tpu.pipelines.paint_schedulers import DDIMScheduler

Array = jax.Array

# stabilityai/stable-diffusion-x4-upscaler UNet: 7-ch conv_in (4 latent +
# 3 image), no attention in the first down block, noise-level class labels
X4_UNET = dataclasses.replace(
    paint_unet.dual_config(paint_unet.DEFAULT),
    in_channels=7, block_out_channels=(256, 512, 512, 1024),
    cross_attention_dim=1024, num_heads=8,
    down_cross=(False, True, True, True),
    use_camera_embedding=True, class_embed_type="table",
    num_class_embeds=1000)
X4_UNET_TINY = dataclasses.replace(
    X4_UNET, block_out_channels=(32, 64), layers_per_block=1,
    cross_attention_dim=32, num_heads=2, down_cross=(False, True),
    norm_num_groups=8)

# f=4 VAE (3 blocks, 2 downsamples), scaling 0.08333
X4_VAE = dataclasses.replace(
    sd_vae.DEFAULT, block_out_channels=(128, 256, 512),
    scaling_factor=0.08333)
X4_VAE_TINY = dataclasses.replace(
    sd_vae.TINY, block_out_channels=(32, 32, 32), scaling_factor=0.08333)


@functools.partial(jax.jit, static_argnames=("ucfg", "vcfg", "sched"))
def _upscale_loop(unet_params, ucfg, vae_params, vcfg, sched, key, image_m11,
                  context, timesteps, alphas_cumprod, lowres_alphas_cumprod,
                  noise_level, guidance_scale):
    """low-res image [1,h,w,3] in [-1,1] → upscaled [1,4h,4w,3] in [-1,1].

    ``sched`` is the checkpoint's DDIMScheduler (frozen dataclass → static);
    ``lowres_alphas_cumprod`` is the separate low_res_scheduler's ᾱ table
    (diffusers StableDiffusionUpscalePipeline noises the conditioning image
    with its own DDPM schedule, not the denoise scheduler's)."""
    key, k1, k2 = jax.random.split(key, 3)
    # DDPM-noise the low-res conditioning image at noise_level
    img = sched.add_noise(image_m11,
                          jax.random.normal(k1, image_m11.shape, jnp.float32),
                          noise_level, lowres_alphas_cumprod)
    img2 = jnp.concatenate([img, img], axis=0)          # CFG pair
    nl2 = jnp.full((2,), noise_level, jnp.int32)
    ctx2 = jnp.broadcast_to(context[None],
                            (2,) + context.shape).astype(jnp.bfloat16)

    b, h, w, _ = image_m11.shape
    lat = jax.random.normal(k2, (b, h, w, vcfg.latent_channels), jnp.float32)
    # DDIM init: x_T = noise * sqrt(1/ᾱ_T - 1 + 1) ≈ noise (init_noise_sigma
    # is 1.0 for DDIM)

    def body(carry, i):
        lat, key = carry
        t = timesteps[i]
        t_prev = jnp.where(i + 1 < timesteps.shape[0],
                           timesteps[jnp.minimum(i + 1,
                                                 timesteps.shape[0] - 1)],
                           -1)
        lmi = jnp.broadcast_to(lat, (2,) + lat.shape[1:])
        inp = jnp.concatenate([lmi, img2], axis=-1).astype(jnp.bfloat16)
        tt = jnp.full((2,), t, jnp.float32)
        out2 = paint_unet.unet_apply(
            unet_params, ucfg, inp, tt, ctx2, nl2, "r", 1, {},
        ).astype(jnp.float32)
        e_unc, e_txt = jnp.split(out2, 2, axis=0)
        model_out = e_unc + guidance_scale * (e_txt - e_unc)
        lat, _ = sched.step(model_out, lat, t, t_prev, alphas_cumprod)
        return (lat, key), None

    (lat, _), _ = jax.lax.scan(body, (lat, key),
                               jnp.arange(timesteps.shape[0]))
    img_out = sd_vae.decode(vae_params, vcfg,
                            (lat * vcfg.scaling_factor).astype(jnp.bfloat16))
    return jnp.clip(img_out.astype(jnp.float32), -1.0, 1.0)


class UpscalePipeline:
    """Low-res image → 4× image. Drop-in backend for utils/imagesuper.py
    Image_Super_Net (PIL → PIL)."""

    def __init__(self, unet_params, ucfg, vae_params, vcfg, text_embed,
                 uncond_embed=None, num_inference_steps: int = 5,
                 guidance_scale: float = 9.0, noise_level: int = 20,
                 scheduler: DDIMScheduler | None = None,
                 low_res_alphas_cumprod=None):
        self.unet_params = unet_params
        self.ucfg = ucfg
        self.vae_params = vae_params
        self.vcfg = vcfg
        self.text_embed = jnp.asarray(text_embed)
        self.uncond_embed = (jnp.asarray(uncond_embed)
                             if uncond_embed is not None else self.text_embed)
        self.num_inference_steps = num_inference_steps
        self.guidance_scale = guidance_scale
        self.noise_level = noise_level
        self.scheduler = scheduler if scheduler is not None else DDIMScheduler()
        # default: reuse the denoise scheduler's ᾱ (matches pre-round-4
        # behavior when no low_res_scheduler config is available)
        self.low_res_alphas_cumprod = (
            np.asarray(low_res_alphas_cumprod, np.float32)
            if low_res_alphas_cumprod is not None
            else self.scheduler.alphas_cumprod().astype(np.float32))

    @classmethod
    def init_random(cls, key=None, size: str = "tiny",
                    num_inference_steps: int = 5):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        ucfg = X4_UNET if size == "full" else X4_UNET_TINY
        vcfg = X4_VAE if size == "full" else X4_VAE_TINY
        text = jax.random.normal(k3, (77, ucfg.cross_attention_dim),
                                 jnp.float32) * 0.02
        return cls(jax.jit(paint_unet.init, static_argnums=1)(k1, ucfg), ucfg,
                   jax.jit(sd_vae.init, static_argnums=1)(k2, vcfg), vcfg,
                   text, num_inference_steps=num_inference_steps)

    def __call__(self, image: Image.Image, prompt: str = "",
                 seed: int = 0) -> Image.Image:
        """Parity surface: Image_Super_Net.__call__ (PIL → PIL, 4×). The
        prompt is ignored unless custom embeds were provided (the reference
        always calls with '')."""
        x = np.asarray(image.convert("RGB"), np.float32) / 255.0 * 2.0 - 1.0
        # empty prompt → text == uncond; CFG still applied (reference default)
        ctx = self.text_embed
        timesteps, ac = self.scheduler.make_tables(self.num_inference_steps)
        out = _upscale_loop(
            self.unet_params, self.ucfg, self.vae_params, self.vcfg,
            self.scheduler, jax.random.PRNGKey(seed), jnp.asarray(x)[None],
            ctx, jnp.asarray(timesteps), jnp.asarray(ac),
            jnp.asarray(self.low_res_alphas_cumprod),
            jnp.int32(self.noise_level), jnp.float32(self.guidance_scale))
        out01 = (np.asarray(out[0]) + 1.0) / 2.0
        return Image.fromarray((np.clip(out01, 0, 1) * 255).astype(np.uint8))
