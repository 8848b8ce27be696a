"""Core NN primitives as pure functions over parameter dicts.

Design: every "module" is (init_fn → params pytree, apply_fn(params, x)).
Parameters are plain nested dicts so that the checkpoint loader
(hunyuan3d2_tpu/io/checkpoints.py) can map torch state-dict names 1:1 and so
that sharding rules can be expressed as pytree path patterns.

Dtype policy (see SURVEY.md §7 hard-part 5): weights bf16 on TPU, matmuls
accumulate in fp32 via ``preferred_element_type``, and normalizations compute
in fp32 (parity with the fp32 upcasts at reference
hy3dgen/shapegen/models/denoisers/hunyuan3ddit.py:89-92).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Default parameter dtype. bf16 keeps the MXU fed; fp32 accumulation is forced
# at every dot below.
PARAM_DTYPE = jnp.bfloat16


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------
class Linear:
    """Affine map y = x @ w + b with JAX-natural kernel layout [in, out].

    Torch checkpoints store weight as [out, in]; the loader transposes
    (io/checkpoints.py). Behavioral parity with ``torch.nn.Linear``.
    """

    @staticmethod
    def init(key, in_dim: int, out_dim: int, bias: bool = True, dtype=None):
        dtype = dtype or PARAM_DTYPE
        # torch.nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both.
        bound = 1.0 / math.sqrt(in_dim)
        kw, kb = jax.random.split(key)
        p = {"w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound).astype(dtype)}
        if bias:
            p["b"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound).astype(dtype)
        return p

    @staticmethod
    def apply(p, x: Array) -> Array:
        return dense(x, p["w"], p.get("b"))


def dense(x: Array, w: Array, b: Optional[Array] = None) -> Array:
    """x @ w (+ b) with fp32 accumulation, output in x.dtype."""
    y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Normalizations (fp32 internals)
# ---------------------------------------------------------------------------
def layer_norm(x: Array, scale: Optional[Array] = None, bias: Optional[Array] = None,
               eps: float = 1e-6) -> Array:
    """LayerNorm over the last axis. scale/bias None ⇒ non-affine
    (parity: ``nn.LayerNorm(..., elementwise_affine=False)``)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def rms_norm(x: Array, scale: Array, eps: float = 1e-6) -> Array:
    """RMSNorm with fp32 internals then rescale (parity:
    reference hunyuan3ddit.py RMSNorm: x.float(); rrms; (x*rrms).to(dtype)*scale)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    rrms = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    return ((x32 * rrms).astype(dtype) * scale.astype(dtype))


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------
def gelu_tanh(x: Array) -> Array:
    """GELU with tanh approximation (parity: reference DiT MLPs use
    ``nn.GELU(approximate='tanh')``)."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x: Array) -> Array:
    return jax.nn.gelu(x, approximate=False)


def silu(x: Array) -> Array:
    return jax.nn.silu(x)
