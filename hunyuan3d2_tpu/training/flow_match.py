"""Flow-matching training for the shape DiT.

The reference is inference-only (SURVEY.md: no training loop anywhere;
requirements.txt training deps commented out). This module adds the natural
training capability for the same model family — rectified-flow / flow-matching
velocity regression:

    x_t = (1−σ)·x₀ + σ·x₁,  x₀~N(0,I),  σ~U(0,1)
    target v = x₁ − x₀
    loss = E‖model(x_t, σ, cond) − v‖²

The train step is pure (params, opt_state, batch, rng) → (params, opt_state,
loss) and is jitted over a (dp, tp) mesh: batch sharded on dp, params sharded
per parallel/sharding.py, gradients reduced by XLA's SPMD partitioner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from hunyuan3d2_tpu.models import dit as dit_lib


def flow_match_loss(params, cfg: dit_lib.DiTConfig, key, latents, cond,
                    guidance=None):
    """latents: [B, L, C] clean data (x₁); cond: [B, Lc, D]."""
    k_noise, k_t = jax.random.split(key)
    x0 = jax.random.normal(k_noise, latents.shape, jnp.float32)
    sigma = jax.random.uniform(k_t, (latents.shape[0],), jnp.float32)
    x1 = latents.astype(jnp.float32)
    xt = (1.0 - sigma[:, None, None]) * x0 + sigma[:, None, None] * x1
    target = x1 - x0
    pred = dit_lib.apply(params, cfg, xt.astype(jnp.bfloat16), sigma, cond,
                         guidance).astype(jnp.float32)
    return jnp.mean(jnp.square(pred - target))


def make_train_step(cfg: dit_lib.DiTConfig, optimizer=None):
    optimizer = optimizer or optax.adamw(1e-4, weight_decay=0.01)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, key, latents, cond):
        loss, grads = jax.value_and_grad(
            lambda p: flow_match_loss(p, cfg, key, latents, cond))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return optimizer, train_step
