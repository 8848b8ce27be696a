"""Per-stage breakdown of the paint 'Diffusion Window': the bench window is
cond-VAE encodes (13×512²) + ref cache build + N-step UNet scan + 6 VAE
decodes. Times each warm on the real chip so the MFU attack (VERDICT r4 #2)
targets the right stage.

Run: python scripts/profile_paint_window.py [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from trace_util import sync  # noqa: E402 (block_until_ready lies over axon)

from hunyuan3d2_tpu.models import paint_unet, sd_vae  # noqa: E402

PEAK_BF16 = 197e12  # v5e


def bench(name, fn, flops=0.0, n=3):
    print(f"[compile] {name} ...", flush=True)
    t0 = time.perf_counter()
    sync(fn())  # compile
    print(f"[compile] {name} done in {time.perf_counter()-t0:.1f}s", flush=True)
    sync(fn())  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        sync(fn())
    dt = (time.perf_counter() - t0) / n
    mfu = flops / dt / PEAK_BF16 if flops else 0.0
    print(f"{name:28s} {dt*1e3:9.1f} ms   {flops/1e12:6.2f} TF   MFU {mfu:.3f}",
          flush=True)
    return dt


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    ucfg = paint_unet.DEFAULT
    vcfg = sd_vae.DEFAULT
    key = jax.random.PRNGKey(0)
    uparams = jax.jit(paint_unet.init, static_argnums=1)(key, ucfg)
    vparams = jax.jit(sd_vae.init, static_argnums=1)(key, vcfg)
    b, n_gen, n_ref, hw, vs = 1, 6, 1, 64, 512

    # 13 × 512² cond encodes (2·6 control + 1 ref), pipeline split 1+6+6
    imgs = jax.random.randint(key, (13, vs, vs, 3), 0, 255, jnp.uint8)
    enc_f = sd_vae.flops(vcfg, vs, vs, 1, "encode") * 13

    from hunyuan3d2_tpu.pipelines.hunyuanpaint import _encode_jit

    def encode_split():
        a = _encode_jit(vparams, vcfg, imgs[:1])
        c = _encode_jit(vparams, vcfg, imgs[1:7])
        d = _encode_jit(vparams, vcfg, imgs[7:])
        return a, c, d

    t_enc = bench("vae encode 1+6+6 (jit)", encode_split, enc_f)

    # ref cache build ('w' pass)
    ref = jax.random.normal(key, (b, n_ref, hw, hw, 4), jnp.bfloat16)
    cam_r = jnp.zeros((b, n_ref), jnp.int32)
    step_f, build_f = paint_unet.apply_flops(ucfg, hw, hw, n_gen, n_ref, b)

    sample = jax.random.normal(key, (b, n_gen, hw, hw, 4), jnp.bfloat16)
    nrm = jax.random.normal(key, (b, n_gen, hw, hw, 4), jnp.bfloat16)
    pos = jax.random.normal(key, (b, n_gen, hw, hw, 4), jnp.bfloat16)
    cam = jnp.zeros((b, n_gen), jnp.int32)

    @jax.jit
    def build_cache():
        _, cache = paint_unet.apply(uparams, ucfg, sample * 0, 0.0, nrm * 0,
                                    pos * 0, ref, cam, cam_r)
        return cache

    cache = build_cache()
    t_build = bench("ref cache build ('w' pass)", build_cache, build_f)

    @jax.jit
    def one_step(sample, cache):
        out, _ = paint_unet.apply(uparams, ucfg, sample, 500.0, nrm, pos, ref,
                                  cam, cam_r, cache=cache)
        return out

    t_step = bench("unet step ('r' pass, cached)", lambda: one_step(sample, cache),
                   step_f)

    # 6 VAE decodes
    lat = jax.random.normal(key, (n_gen, hw, hw, 4), jnp.bfloat16)
    dec_f = sd_vae.flops(vcfg, hw, hw, 1, "decode") * n_gen

    @jax.jit
    def decode(lat):
        return sd_vae.decode(vparams, vcfg, lat / 0.18215)

    t_dec = bench("vae decode x6 (batched)", lambda: decode(lat), dec_f)

    total = t_enc + t_build + n_steps * t_step + t_dec
    total_f = enc_f + build_f + n_steps * step_f + dec_f
    print(f"\nwindow model ({n_steps} steps): {total:.3f}s  "
          f"{total_f/1e12:.1f} TF  MFU {total_f/total/PEAK_BF16:.3f}")


if __name__ == "__main__":
    main()
