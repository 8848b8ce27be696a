"""Ablation profile of the production 2.5D UNet r-forward on the real chip.

Times the full forward against variants with multiview attention and/or
reference attention disabled (config flags), plus an attention-stubbed
variant (attention → identity on q), plus the standalone Pallas flash
attention at the multiview shape. Identifies where the 500 ms/step goes.
"""

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.models import paint_unet
from hunyuan3d2_tpu.ops import attention as attn_mod
from hunyuan3d2_tpu.pipelines.hunyuanpaint import HunyuanPaintPipeline


def timed(name, fn, n=3):
    t0 = time.perf_counter()
    fn(0)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        fn(i)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt * 1e3:9.1f} ms   (first {t_compile:.1f}s)",
          flush=True)
    return dt


def main():
    pipe = HunyuanPaintPipeline.init_random(
        jax.random.PRNGKey(1), size="full", view_size=512)
    ucfg = pipe.unet_cfg
    up = pipe.unet_params
    key = jax.random.PRNGKey(0)
    B, N, h, w = 1, 6, 64, 64
    lat = jax.random.normal(key, (B, N, h, w, 4), jnp.bfloat16)
    nl = jax.random.normal(key, (B, N, h, w, 4), jnp.bfloat16)
    pl = jax.random.normal(key, (B, N, h, w, 4), jnp.bfloat16)
    rl = jax.random.normal(key, (B, 1, h, w, 4), jnp.bfloat16)
    cg = jnp.asarray([[25, 26, 27, 28, 40, 36]], jnp.int32)
    cr = jnp.asarray([[0]], jnp.int32)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    def make_fwd(cfg):
        wp = jax.jit(lambda p, z, a, b, r: paint_unet.apply(
            p, cfg, z, jnp.float32(0.0), a, b, r, cg, cr)[1])
        cache = wp(up, jnp.zeros_like(lat), nl, pl, rl)
        jax.block_until_ready(cache)
        f = jax.jit(lambda p, x, t, a, b, r, c: paint_unet.apply(
            p, cfg, x, t, a, b, r, cg, cr, cache=c)[0])
        return lambda i: sync(f(up, lat + i * 0.01, jnp.float32(100.0 + i),
                                nl, pl, rl, cache))

    timed("full r-forward", make_fwd(ucfg))
    timed("no multiview attn",
          make_fwd(dataclasses.replace(ucfg, use_multiview_attention=False)))
    timed("no reference attn",
          make_fwd(dataclasses.replace(ucfg, use_reference_attention=False)))
    timed("no mv + no ref",
          make_fwd(dataclasses.replace(ucfg, use_multiview_attention=False,
                                       use_reference_attention=False)))

    # attention stub: measures the conv/GN/everything-else floor
    orig_attn = attn_mod.attention
    orig_sdpa = attn_mod.sdpa
    try:
        attn_mod.attention = lambda q, k, v, scale=None, mask=None: q
        attn_mod.sdpa = lambda q, k, v, scale=None, mask=None: q
        paint_unet.attn_op = attn_mod.attention
        timed("attention stubbed (conv floor)", make_fwd(ucfg))
    finally:
        attn_mod.attention = orig_attn
        attn_mod.sdpa = orig_sdpa
        paint_unet.attn_op = orig_attn

    # standalone attention shapes of interest
    from hunyuan3d2_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(key, (1, 5, 24576, 64), jnp.bfloat16)
    fa = jax.jit(lambda q: flash_attention(q, q, q))
    timed("flash mv 24576x24576 (5 heads)", lambda i: sync(fa(q + i * 0.01)))
    q2 = jax.random.normal(key, (6, 5, 4096, 64), jnp.bfloat16)
    k2 = jax.random.normal(key, (6, 5, 8192, 64), jnp.bfloat16)
    fa2 = jax.jit(lambda q, k: flash_attention(q, k, k))
    timed("flash ref 4096x8192 x6 (5 heads)",
          lambda i: sync(fa2(q2 + i * 0.01, k2)))
    sd = jax.jit(lambda q, k: attn_mod.sdpa(q, k, k))
    timed("sdpa ref 4096x8192 x6 (5 heads)",
          lambda i: sync(sd(q2 + i * 0.01, k2)))


if __name__ == "__main__":
    main()
