"""Condition encoders (image → token sequence) for the shape DiT.

Behavioral parity: reference hy3dgen/shapegen/models/conditioner.py
(ImageEncoder :57, DinoImageEncoder :127, DinoImageEncoderMV :134,
DualImageEncoder :214, SingleImageEncoder :239, build_image_encoder :203).

The encoders own the 518×518 resize/normalize transform (conditioner.py:80-89)
— done host-side in utils/imageproc.py — and produce:
  * last_hidden_state [B, 1370, 1536]  (Dino-giant)
  * unconditional embedding = encoding of a zero image (conditioner.py:106-117)
  * MV variant: per-view 1D sin-cos view embedding added to every token, views
    flattened into one sequence (conditioner.py:154-188).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.models import dinov2
from hunyuan3d2_tpu.ops.embeddings import sincos_1d_pos_embed

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DinoEncoderConfig:
    dino: dinov2.DinoConfig = dinov2.GIANT
    image_size: int = 518
    use_cls_token: bool = True  # keep CLS in the sequence (reference default)


class DinoImageEncoder:
    """Single-view DINOv2 conditioner."""

    def __init__(self, params, cfg: DinoEncoderConfig = DinoEncoderConfig()):
        self.params = params
        self.cfg = cfg

    @classmethod
    def init_random(cls, key, cfg: DinoEncoderConfig = DinoEncoderConfig()):
        # jitted init: one compile instead of ~100 eager per-layer dispatches
        # (each ~0.5 s through the remote-compile tunnel)
        import jax as _jax

        return cls(_jax.jit(dinov2.init, static_argnums=1)(key, cfg.dino), cfg)

    def encode(self, pixel_values: Array) -> Array:
        """pixel_values: [B, H, W, 3] already normalized. → [B, L, hidden]."""
        out = dinov2.apply_jit(self.params, self.cfg.dino, pixel_values)
        if not self.cfg.use_cls_token:
            out = out[:, 1:]
        return out

    def preprocess(self, image_m11) -> Array:
        """[-1,1] [B,H,W,3] numpy → normalized pixel values at this tower's
        resolution (parity: the per-encoder transform, conditioner.py:80-89)."""
        from hunyuan3d2_tpu.utils.imageproc import dino_transform

        return jnp.asarray(dino_transform(image_m11, self.cfg.image_size),
                           jnp.bfloat16)

    def unconditional(self, batch: int, num_views: int = 1) -> Array:
        """Zero-token unconditional embedding [B, L, hidden] (parity:
        conditioner.py:106-117 — a zeros tensor, NOT an encoded zero image)."""
        l = self.cfg.dino.seq_len if self.cfg.use_cls_token else self.cfg.dino.num_patches
        return jnp.zeros((batch, l * num_views, self.cfg.dino.hidden_size), jnp.bfloat16)


class DinoImageEncoderMV(DinoImageEncoder):
    """Multiview conditioner: encodes each view, adds a per-view sin-cos view
    embedding to every token of that view, then flattens views into a single
    token sequence (reference conditioner.py:154-188)."""

    def __init__(self, params, cfg: DinoEncoderConfig = DinoEncoderConfig(),
                 num_views: int = 4):
        super().__init__(params, cfg)
        self.num_views = num_views
        self.view_embeds = sincos_1d_pos_embed(
            cfg.dino.hidden_size, jnp.arange(num_views)
        )  # [num_views, hidden]

    def encode_views(self, pixel_values: Array, view_idxs: Sequence[int]) -> Array:
        """pixel_values: [B, V, H, W, 3] → [B, V*L, hidden]."""
        b, v = pixel_values.shape[:2]
        flat = pixel_values.reshape((b * v,) + pixel_values.shape[2:])
        tokens = self.encode(flat)  # [B*V, L, hidden]
        tokens = tokens.reshape(b, v, tokens.shape[1], tokens.shape[2])
        ve = self.view_embeds[jnp.asarray(view_idxs)]  # [V, hidden]
        tokens = tokens + ve[None, :, None, :].astype(tokens.dtype)
        return tokens.reshape(b, v * tokens.shape[2], tokens.shape[3])


class SingleImageEncoder:
    """Parity: conditioner.py:239 — one main encoder, returns
    ``{'main': tokens}`` contexts dict consumed by the DiT."""

    def __init__(self, main_image_encoder: DinoImageEncoder):
        self.main = main_image_encoder

    def __call__(self, image: Array, **kwargs) -> dict:
        return {"main": self.main.encode(image)}

    def encode_image(self, image_m11, view_idxs=None) -> dict:
        """[-1,1] numpy image(s) → per-tower token streams, each tower using
        its OWN transform (dino 518 / clip 224; conditioner.py:80-89)."""
        if view_idxs is not None:
            b, v = image_m11.shape[:2]
            flat = image_m11.reshape((b * v,) + image_m11.shape[2:])
            pixel = self.main.preprocess(flat)
            pixel = pixel.reshape((b, v) + pixel.shape[1:])
            return {"main": self.main.encode_views(pixel, view_idxs[0])}
        return {"main": self.main.encode(self.main.preprocess(image_m11))}

    def unconditional(self, batch: int, num_views: int = 1) -> dict:
        return {"main": self.main.unconditional(batch, num_views)}


class DualImageEncoder(SingleImageEncoder):
    """Parity: conditioner.py:214 — main (Dino) + additional (CLIP) towers,
    each with its own transform; returns {'main', 'additional'} streams and
    zero-token unconditional embeddings for both. (The Hunyuan3D-DiT forward
    consumes contexts['main']; the additional stream is produced for parity
    with the v2-0 checkpoints' conditioner contract.)"""

    def __init__(self, main_image_encoder, additional_image_encoder=None):
        super().__init__(main_image_encoder)
        self.additional = additional_image_encoder

    def __call__(self, image: Array, **kwargs) -> dict:
        out = {"main": self.main.encode(image)}
        if self.additional is None:
            raise ValueError(
                "DualImageEncoder requires the additional (CLIP) tower; "
                "provide additional_image_encoder."
            )
        out["additional"] = self.additional.encode(image)
        return out

    def encode_image(self, image_m11, view_idxs=None) -> dict:
        if self.additional is None:
            raise ValueError(
                "DualImageEncoder requires the additional (CLIP) tower; "
                "provide additional_image_encoder."
            )
        out = super().encode_image(image_m11, view_idxs)
        flat = image_m11
        if view_idxs is not None:
            b, v = image_m11.shape[:2]
            flat = image_m11.reshape((b * v,) + image_m11.shape[2:])
        out["additional"] = self.additional.encode(
            self.additional.preprocess(flat))
        return out

    def unconditional(self, batch: int, num_views: int = 1) -> dict:
        out = super().unconditional(batch, num_views)
        if self.additional is not None:
            out["additional"] = self.additional.unconditional(batch, num_views)
        return out
