"""HunyuanPaint multiview diffusion pipeline (image + control maps → views).

Behavioral parity: reference hy3dgen/texgen/hunyuanpaint/pipeline.py
(HunyuanPaintPipeline :194): learned text embeddings instead of prompts
(:364), ref image + normal/position control maps encoded through the SD VAE
(:232-244, 302-315), CFG implemented by zeroing the REFERENCE latents and a
per-branch ref_scale [0,1] (:341-362), per-step 2.5D UNet loop (:645-701),
EulerAncestral (standard) / LCM (turbo) schedulers (multiview_utils.py:40-46).

TPU-first: the whole N-step denoise loop is one jitted ``lax.scan``; the
reference branch ('w' pass) runs ONCE before the loop and its per-layer token
cache is carried as a constant; views live on the batch axis (dp-shardable).
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.models import paint_unet, sd_vae
from hunyuan3d2_tpu.pipelines.paint_schedulers import (
    EulerAncestralDiscreteScheduler,
    LCMScheduler,
)
from hunyuan3d2_tpu.utils.timer import timed_scope


def to_rgb_image(image, bg: int = 255):
    """RGBA → RGB on white (parity: hunyuanpaint/pipeline.py:180)."""
    from PIL import Image

    if isinstance(image, Image.Image):
        if image.mode == "RGB":
            return image
        arr = np.asarray(image.convert("RGBA")).astype(np.float32)
        alpha = arr[..., 3:] / 255.0
        rgb = arr[..., :3] * alpha + bg * (1 - alpha)
        return Image.fromarray(rgb.astype(np.uint8))
    return image


def _pil_to_array01(img, size: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    if isinstance(img, Image.Image):
        if size is not None and img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        arr = np.asarray(img).astype(np.float32) / 255.0
    else:
        arr = np.asarray(img, np.float32)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    if arr.shape[-1] == 4:
        alpha = arr[..., 3:]
        arr = arr[..., :3] * alpha + (1 - alpha)
    return arr


def _pil_to_array_u8(img, size: Optional[int] = None) -> np.ndarray:
    """uint8 RGB host array — 4x less tunnel upload than fp32; the /255
    normalization happens on device (encode_images)."""
    from PIL import Image

    if isinstance(img, Image.Image):
        if size is not None and img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        arr = np.asarray(img)
    else:
        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    if arr.shape[-1] == 4:
        a = arr[..., 3:].astype(np.uint32)
        rgb = (arr[..., :3].astype(np.uint32) * a + 255 * (255 - a)) // 255
        arr = rgb.astype(np.uint8)
    return arr


@functools.partial(jax.jit, static_argnames=("vcfg",))
def _encode_jit(vae_params, vcfg, flat):
    """One fused VAE-encode program (u8 normalize + encoder). Eager
    sd_vae.encode ran op-by-op — hundreds of unfused dispatches (unfused
    GroupNorms are pure HBM traffic) over the remote tunnel."""
    if flat.dtype == jnp.uint8:
        flat = flat.astype(jnp.bfloat16) / 255.0
    flat = flat.astype(jnp.bfloat16) * 2.0 - 1.0
    return sd_vae.encode(vae_params, vcfg, flat)


@functools.partial(jax.jit, static_argnames=("ucfg", "vcfg", "do_cfg", "guidance_scale"))
def _denoise_loop(unet_params, ucfg, vae_params, vcfg, key,
                  ref_latents, normal_latents, position_latents,
                  cam_gen, cam_ref, timesteps, sigmas,
                  guidance_scale: float, do_cfg: bool):
    """Compiled standard (EulerAncestral) denoise loop.

    All latent tensors [B(, N), h, w, 4] NHWC with B=2 for CFG ([uncond|cond]
    on the batch axis, ref_scale [0,1])."""
    b, n_gen = normal_latents.shape[:2]
    h, w = normal_latents.shape[2:4]
    key, k0 = jax.random.split(key)
    latents = jax.random.normal(k0, (1, n_gen, h, w, 4), jnp.float32)
    # EulerAncestral init: x_T = noise * sigma_max
    latents = latents * sigmas[0]

    ref_scale = jnp.asarray([0.0, 1.0], jnp.float32) if do_cfg else 1.0

    # reference 'w' pass once, per CFG branch (zero ref latents for uncond)
    _, cache = paint_unet.apply(
        unet_params, ucfg,
        jnp.zeros((b, n_gen, h, w, 4), normal_latents.dtype),
        jnp.float32(0.0), normal_latents, position_latents, ref_latents,
        cam_gen, cam_ref)

    sched = EulerAncestralDiscreteScheduler()
    n_steps = timesteps.shape[0]

    def body(carry, i):
        lat, key = carry
        sigma = sigmas[i]
        t = timesteps[i]
        lat_in = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
        lat_in = sched.scale_model_input(lat_in.astype(jnp.float32), sigma)
        pred, _ = paint_unet.apply(
            unet_params, ucfg, lat_in.astype(normal_latents.dtype), t,
            normal_latents, position_latents, ref_latents, cam_gen, cam_ref,
            cache=cache, ref_scale=ref_scale)
        pred = pred.astype(jnp.float32)
        if do_cfg:
            uncond, cond = jnp.split(pred, 2, axis=0)
            pred = uncond + guidance_scale * (cond - uncond)
        key, kn = jax.random.split(key)
        noise = jax.random.normal(kn, lat.shape, jnp.float32)
        lat, _ = sched.step(pred, lat.astype(jnp.float32), sigma, sigmas[i + 1], noise)
        return (lat, key), None

    (latents, _), _ = jax.lax.scan(body, (latents, key), jnp.arange(n_steps))
    # decode views one at a time (lax.map): the 512² decoder activations for
    # six views at once peak at multiple GB of HBM — sequential decode cuts
    # the peak 6x for the same total compute
    images = jax.lax.map(
        lambda z: sd_vae.decode(vae_params, vcfg,
                                z[None].astype(jnp.bfloat16))[0],
        latents[0])
    # quantize ON DEVICE: uint8 crosses the tunnel (4x less than fp32)
    img01 = jnp.clip(images.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.round(img01 * 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("ucfg", "vcfg", "mask_grids"))
def _denoise_loop_lcm(unet_params, ucfg, vae_params, vcfg, key,
                      ref_latents, normal_latents, position_latents,
                      cam_gen, cam_ref, timesteps, alphas_cumprod,
                      position01=None, mask_grids=()):
    """Turbo path: LCM consistency sampling, no CFG (parity:
    hunyuanpaint/pipeline.py:598-603 turbo schedule; LCM step semantics).
    position01: [B, N, H, W, 3] uint8/float position maps — the voxel
    attention masks are built here, inside the compiled program."""
    mva_masks = None
    if position01 is not None and mask_grids:
        pos = position01.astype(jnp.float32)
        if position01.dtype == jnp.uint8:
            pos = pos / 255.0
        mva_masks = {}
        for g in mask_grids:
            m = paint_unet.compute_voxel_grid_mask(pos, g)
            mva_masks[int(m.shape[1])] = m
    b, n_gen = normal_latents.shape[:2]
    h, w = normal_latents.shape[2:4]
    key, k0 = jax.random.split(key)
    latents = jax.random.normal(k0, (b, n_gen, h, w, 4), jnp.float32)

    _, cache = paint_unet.apply(
        unet_params, ucfg,
        jnp.zeros((b, n_gen, h, w, 4), normal_latents.dtype),
        jnp.float32(0.0), normal_latents, position_latents, ref_latents,
        cam_gen, cam_ref)

    sched = LCMScheduler()
    n_steps = timesteps.shape[0]

    def body(carry, i):
        lat, key = carry
        t = timesteps[i]
        t_next = jnp.where(i + 1 < n_steps, timesteps[jnp.minimum(i + 1, n_steps - 1)], 0.0)
        pred, _ = paint_unet.apply(
            unet_params, ucfg, lat.astype(normal_latents.dtype), t,
            normal_latents, position_latents, ref_latents, cam_gen, cam_ref,
            cache=cache, mva_masks=mva_masks)
        key, kn = jax.random.split(key)
        noise = jax.random.normal(kn, lat.shape, jnp.float32)
        lat, _ = sched.step(pred.astype(jnp.float32), lat.astype(jnp.float32),
                            t.astype(jnp.int32), t_next.astype(jnp.int32),
                            alphas_cumprod, noise)
        return (lat, key), None

    (latents, _), _ = jax.lax.scan(body, (latents, key), jnp.arange(n_steps))
    # decode views one at a time (lax.map): the 512² decoder activations for
    # six views at once peak at multiple GB of HBM — sequential decode cuts
    # the peak 6x for the same total compute
    images = jax.lax.map(
        lambda z: sd_vae.decode(vae_params, vcfg,
                                z[None].astype(jnp.bfloat16))[0],
        latents[0])
    img01 = jnp.clip(images.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
    return jnp.round(img01 * 255.0).astype(jnp.uint8)


class HunyuanPaintPipeline:
    """Parity: hunyuanpaint/pipeline.py HunyuanPaintPipeline (:194)."""

    def __init__(self, unet_params, unet_cfg: paint_unet.PaintUNetConfig,
                 vae_params, vae_cfg: sd_vae.SDVAEConfig, scheduler=None,
                 view_size: int = 512):
        self.unet_params = unet_params
        self.unet_cfg = unet_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.scheduler = scheduler or EulerAncestralDiscreteScheduler()
        self.view_size = view_size
        self.is_turbo = False

    @classmethod
    def init_random(cls, key=None, size: str = "tiny", view_size: int = 64):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        ucfg = paint_unet.TINY if size == "tiny" else paint_unet.DEFAULT
        vcfg = sd_vae.TINY if size == "tiny" else sd_vae.DEFAULT
        # jitted inits: one compile each instead of eager per-layer dispatches
        # (each ~0.5 s through the remote-compile tunnel)
        return cls(jax.jit(paint_unet.init, static_argnums=1)(k1, ucfg), ucfg,
                   jax.jit(sd_vae.init, static_argnums=1)(k2, vcfg), vcfg,
                   view_size=view_size)

    def shard(self, mesh=None):
        """Distribute the paint stack over a device `Mesh`: UNet/VAE weights
        tensor-parallel ("tp"), the multiview batch data-parallel ("dp") via
        GSPMD propagation from the param shardings. Call sites unchanged."""
        from hunyuan3d2_tpu.parallel import make_mesh, shard_params

        self.mesh = mesh if mesh is not None else make_mesh()
        self.unet_params = shard_params(self.unet_params, self.mesh)
        self.vae_params = shard_params(self.vae_params, self.mesh)
        return self

    def set_turbo(self, turbo: bool = True):
        self.is_turbo = turbo
        self.scheduler = LCMScheduler() if turbo else EulerAncestralDiscreteScheduler()

    # -- encoding ---------------------------------------------------------------
    def encode_images(self, images01: np.ndarray) -> jax.Array:
        """[B, N, H, W, 3] in [0,1] fp or uint8 → scaled latents
        [B, N, h, w, 4] (parity: pipeline.py:232-244 — ×2−1 then VAE encode
        mode). uint8 input normalizes ON DEVICE (cheap tunnel upload)."""
        b, n = images01.shape[:2]
        flat = jnp.asarray(images01.reshape((b * n,) + images01.shape[2:]))
        lat = _encode_jit(self.vae_params, self.vae_cfg, flat)
        return lat.reshape((b, n) + lat.shape[1:]).astype(jnp.float32)

    # -- main -------------------------------------------------------------------
    def __call__(self, image, *, normal_imgs: List, position_imgs: List,
                 camera_info_gen: List[List[int]], camera_info_ref: List[List[int]],
                 num_inference_steps: int = 30, guidance_scale: float = 2.0,
                 num_in_batch: Optional[int] = None, seed: int = 0, key=None,
                 width: Optional[int] = None, height: Optional[int] = None,
                 output_type: str = "pil", **kwargs):
        from PIL import Image

        key = key if key is not None else jax.random.PRNGKey(seed)
        size = width or self.view_size

        if not isinstance(image, list):
            image = [image]
        ref01 = np.stack([_pil_to_array_u8(to_rgb_image(im), size)
                          for im in image])[None]

        def _stack_views(lst):
            if isinstance(lst, jax.Array):
                return lst[None]     # device uint8 [1, N, H, W, 3]
            views = lst[0] if isinstance(lst[0], list) else lst
            return np.stack([_pil_to_array_u8(v, size) for v in views])[None]

        normal01 = _stack_views(normal_imgs)
        position01 = _stack_views(position_imgs)

        with timed_scope("Paint VAE Encode"):
            ref_latents = self.encode_images(ref01)
            normal_latents = self.encode_images(normal01)
            position_latents = self.encode_images(position01)

        do_cfg = guidance_scale > 1.0 and not self.is_turbo
        cam_gen = jnp.asarray(camera_info_gen, jnp.int32)
        cam_ref = jnp.asarray(camera_info_ref, jnp.int32)

        if self.is_turbo:
            timesteps, ac = LCMScheduler().make_tables(
                min(num_inference_steps, 10))
            # voxel-locality multiview attention mask resolutions (parity:
            # hunyuanpaint/pipeline.py:334-339 turbo path); the masks are
            # computed INSIDE the jitted loop — eagerly they cost ~45 device
            # dispatches (~25 ms each over the remote tunnel)
            grids = tuple(g for g in (32, 16, 8) if position01.shape[3] % g == 0)
            with timed_scope("Paint Denoising (turbo)"):
                images_u8 = _denoise_loop_lcm(
                    self.unet_params, self.unet_cfg, self.vae_params, self.vae_cfg,
                    key, ref_latents.astype(jnp.bfloat16),
                    normal_latents.astype(jnp.bfloat16),
                    position_latents.astype(jnp.bfloat16),
                    cam_gen, cam_ref, jnp.asarray(timesteps), jnp.asarray(ac),
                    jnp.asarray(position01), grids)
                if output_type != "device":
                    images_u8 = np.asarray(images_u8)  # uint8 over the tunnel
            if output_type == "pil":
                out = [Image.fromarray(im) for im in images_u8]
            elif output_type == "device":
                # device uint8 [N,H,W,3]: the caller overlaps host work with
                # the TPU denoise and fetches via np.asarray when needed
                out = images_u8
            else:
                out = images_u8.astype(np.float32) / 255.0

            class _Out:
                pass

            result = _Out()
            result.images = out
            return result

        if do_cfg:
            # [uncond | cond]: zero ref latents for the unconditional branch
            ref_latents = jnp.concatenate(
                [jnp.zeros_like(ref_latents), ref_latents], axis=0)
            normal_latents = jnp.concatenate([normal_latents] * 2, axis=0)
            position_latents = jnp.concatenate([position_latents] * 2, axis=0)
            cam_gen = jnp.concatenate([cam_gen] * 2, axis=0)
            cam_ref = jnp.concatenate([cam_ref] * 2, axis=0)

        timesteps, sigmas = EulerAncestralDiscreteScheduler().make_tables(
            num_inference_steps)

        with timed_scope("Paint Denoising"):
            images_u8 = _denoise_loop(
                self.unet_params, self.unet_cfg, self.vae_params, self.vae_cfg,
                key, ref_latents.astype(jnp.bfloat16),
                normal_latents.astype(jnp.bfloat16),
                position_latents.astype(jnp.bfloat16),
                cam_gen, cam_ref, jnp.asarray(timesteps), jnp.asarray(sigmas),
                float(guidance_scale), do_cfg)
            if output_type != "device":
                images_u8 = np.asarray(images_u8)   # uint8 over the tunnel

        if output_type == "pil":
            out = [Image.fromarray(im) for im in images_u8]
        elif output_type == "device":
            out = images_u8
        else:
            out = images_u8.astype(np.float32) / 255.0

        class _Out:
            pass

        result = _Out()
        result.images = out
        return result
