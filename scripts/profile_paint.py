"""Profile the production-scale paint stack stage by stage on the real chip.

The remote TPU runtime dispatches asynchronously and memoizes identical
executions, so every timed call varies an input and synchronizes by
downloading a scalar reduction (see README 'runtime lessons').

Usage: python scripts/profile_paint.py [n_reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.models import paint_unet, sd_vae
from hunyuan3d2_tpu.pipelines.hunyuanpaint import HunyuanPaintPipeline


def timed(name, fn, n=3):
    # warmup (compile)
    t0 = time.perf_counter()
    fn(0)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        fn(i)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt * 1e3:9.1f} ms   (first call {t_compile:.1f}s)",
          flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    pipe = HunyuanPaintPipeline.init_random(
        jax.random.PRNGKey(1), size="full", view_size=512)
    ucfg, vcfg = pipe.unet_cfg, pipe.vae_cfg
    up, vp = pipe.unet_params, pipe.vae_params
    key = jax.random.PRNGKey(0)
    B, N, h, w = 1, 6, 64, 64
    lat = jax.random.normal(key, (B, N, h, w, 4), jnp.bfloat16)
    nl = jax.random.normal(key, (B, N, h, w, 4), jnp.bfloat16)
    pl = jax.random.normal(key, (B, N, h, w, 4), jnp.bfloat16)
    rl = jax.random.normal(key, (B, 1, h, w, 4), jnp.bfloat16)
    cg = jnp.asarray([[25, 26, 27, 28, 40, 36]], jnp.int32)
    cr = jnp.asarray([[0]], jnp.int32)
    pos01 = jnp.asarray(
        np.random.RandomState(0).randint(0, 255, (B, N, 512, 512, 3),
                                         np.uint8))

    wpass = jax.jit(lambda p, z, a, b, r: paint_unet.apply(
        p, ucfg, z, jnp.float32(0.0), a, b, r, cg, cr)[1])
    cache = wpass(up, jnp.zeros_like(lat), nl, pl, rl)
    jax.block_until_ready(cache)

    masks_fn = jax.jit(lambda pos: {
        g: paint_unet.compute_voxel_grid_mask(
            pos.astype(jnp.float32) / 255.0, g) for g in (32, 16, 8)})
    masks = masks_fn(pos01)
    mva = {int(m.shape[1]): m for m in jax.tree.leaves(masks)}

    fwd = jax.jit(lambda p, x, t, a, b, r, c, m: paint_unet.apply(
        p, ucfg, x, t, a, b, r, cg, cr, cache=c, mva_masks=m)[0])
    dec = jax.jit(lambda p, z: sd_vae.decode(p, vcfg, z.astype(jnp.bfloat16)))
    enc = jax.jit(lambda p, x: sd_vae.encode(
        p, vcfg, x.astype(jnp.bfloat16) * 2.0 - 1.0))

    img512 = jax.random.uniform(key, (B * N, 512, 512, 3), jnp.bfloat16)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    timed("mask build (32/16/8)",
          lambda i: sync(jax.tree.leaves(masks_fn(pos01 + i))[0]), n)
    timed("UNet w-pass (cache build)",
          lambda i: sync(jax.tree.leaves(
              wpass(up, jnp.full_like(lat, i * 0.01), nl, pl, rl))[0]), n)
    timed("UNet r-forward (per step)",
          lambda i: sync(fwd(up, lat + i * 0.01, jnp.float32(100.0 + i),
                             nl, pl, rl, cache, mva)), n)
    timed("UNet r-forward (no masks)",
          lambda i: sync(fwd(up, lat + i * 0.01, jnp.float32(100.0 + i),
                             nl, pl, rl, cache, None)), n)
    timed("VAE decode 6x512",
          lambda i: sync(dec(vp, lat[0] + i * 0.01)), n)
    timed("VAE encode 6x512",
          lambda i: sync(enc(vp, img512 + i * 0.001)), n)


if __name__ == "__main__":
    main()
