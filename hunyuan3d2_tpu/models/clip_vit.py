"""CLIP vision transformer (additional tower of DualImageEncoder).

Behavioral parity: reference hy3dgen/shapegen/models/conditioner.py:120-125
(CLIPImageEncoder wrapping HF CLIPVisionModelWithProjection; the v2-0
standard checkpoints condition on DINO + CLIP through DualImageEncoder
:214). Returns ``last_hidden_state`` (pre-LN ViT encoder output WITHOUT the
final post-layernorm, matching HF semantics).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.attention import attention, merge_heads, split_heads
from hunyuan3d2_tpu.ops.nn import Linear, layer_norm

Array = jax.Array

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    intermediate_size: int = 4096
    ln_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1


LARGE = CLIPVisionConfig()
TINY = CLIPVisionConfig(hidden_size=64, num_layers=2, num_heads=4,
                        patch_size=14, image_size=56, intermediate_size=128)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


def _init_layer(key, cfg: CLIPVisionConfig):
    h = cfg.hidden_size
    ks = jax.random.split(key, 6)
    return {
        "ln1_scale": jnp.ones((h,), jnp.float32),
        "ln1_bias": jnp.zeros((h,), jnp.float32),
        "q": Linear.init(ks[0], h, h),
        "k": Linear.init(ks[1], h, h),
        "v": Linear.init(ks[2], h, h),
        "out": Linear.init(ks[3], h, h),
        "ln2_scale": jnp.ones((h,), jnp.float32),
        "ln2_bias": jnp.zeros((h,), jnp.float32),
        "fc1": Linear.init(ks[4], h, cfg.intermediate_size),
        "fc2": Linear.init(ks[5], cfg.intermediate_size, h),
    }


def init(key, cfg: CLIPVisionConfig = LARGE):
    ks = jax.random.split(key, 5)
    h = cfg.hidden_size
    layers = [_init_layer(k, cfg) for k in jax.random.split(ks[0], cfg.num_layers)]
    return {
        "class_embedding": jax.random.normal(ks[1], (h,), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(ks[2], (cfg.seq_len, h), jnp.float32) * 0.02,
        "patch_proj": {"w": Linear.init(ks[3], 3 * cfg.patch_size ** 2, h,
                                        bias=False)["w"]},
        "pre_ln_scale": jnp.ones((h,), jnp.float32),
        "pre_ln_bias": jnp.zeros((h,), jnp.float32),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }


def _patchify(x: Array, patch: int) -> Array:
    b, h, w, c = x.shape
    gh, gw = h // patch, w // patch
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, gh * gw, c * patch * patch)


def _layer(p, x, cfg: CLIPVisionConfig):
    h = layer_norm(x, p["ln1_scale"], p["ln1_bias"], cfg.ln_eps)
    q = split_heads(Linear.apply(p["q"], h), cfg.num_heads)
    k = split_heads(Linear.apply(p["k"], h), cfg.num_heads)
    v = split_heads(Linear.apply(p["v"], h), cfg.num_heads)
    x = x + Linear.apply(p["out"], merge_heads(attention(q, k, v)))
    h = layer_norm(x, p["ln2_scale"], p["ln2_bias"], cfg.ln_eps)
    return x + Linear.apply(p["fc2"], quick_gelu(Linear.apply(p["fc1"], h)))


def apply(params, cfg: CLIPVisionConfig, pixel_values: Array) -> Array:
    """pixel_values [B,H,W,3] CLIP-normalized → last_hidden_state [B,L,D]."""
    b = pixel_values.shape[0]
    tokens = jnp.dot(_patchify(pixel_values, cfg.patch_size),
                     params["patch_proj"]["w"].astype(pixel_values.dtype),
                     preferred_element_type=jnp.float32).astype(pixel_values.dtype)
    cls = jnp.broadcast_to(params["class_embedding"].astype(tokens.dtype),
                           (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]
    x = layer_norm(x, params["pre_ln_scale"], params["pre_ln_bias"], cfg.ln_eps)

    def body(xc, p):
        return _layer(p, xc, cfg), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


class CLIPImageEncoder:
    """Conditioner-compatible wrapper (mirrors DinoImageEncoder's surface)."""

    def __init__(self, params, cfg: CLIPVisionConfig = LARGE,
                 use_cls_token: bool = True):
        self.params = params
        self.cfg = cfg
        self.use_cls_token = use_cls_token
        # imageproc compatibility
        self.image_size = cfg.image_size

    @classmethod
    def init_random(cls, key, cfg: CLIPVisionConfig = LARGE):
        return cls(init(key, cfg), cfg)

    def encode(self, pixel_values: Array) -> Array:
        out = apply(self.params, self.cfg, pixel_values)
        if not self.use_cls_token:
            out = out[:, 1:]
        return out

    def preprocess(self, image_m11) -> Array:
        """[-1,1] [B,H,W,3] numpy → CLIP-normalized pixels at this tower's
        resolution (parity: CLIPImageEncoder transform, conditioner.py:120-125)."""
        from hunyuan3d2_tpu.utils.imageproc import clip_transform

        return jnp.asarray(clip_transform(image_m11, self.cfg.image_size),
                           jnp.bfloat16)

    def unconditional(self, batch: int, num_views: int = 1) -> Array:
        l = self.cfg.seq_len if self.use_cls_token else self.cfg.num_patches
        return jnp.zeros((batch, l * num_views, self.cfg.hidden_size), jnp.bfloat16)
