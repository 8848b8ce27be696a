"""Profile the flagship v2-0 volume decode (3072-latent ShapeVAE) on TPU.

Compares the streamed fused Pallas kernel (HY3D_FUSED_GEO=1, default) against
the pruned top-k path (HY3D_FUSED_GEO=0) at octree 384 — the reference
flagship hot loop (hy3dgen/shapegen/pipelines.py:470-485, [1, 3072, 64]).

Usage: python scripts/profile_v20_decode.py [octree] [mode]
  mode: 'both' (default) | 'stream' | 'pruned' | 'kernel' (kernel microbench)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.models import shapevae as sv

OCTREE = int(sys.argv[1]) if len(sys.argv) > 1 else 384
MODE = sys.argv[2] if len(sys.argv) > 2 else "both"
NUM_CHUNKS = 262144
PEAK = 197e12


def per_query_flops(cfg, dense=True):
    g_lin = (51 * cfg.width + 3 * cfg.width ** 2
             + 2 * cfg.geo_decoder_mlp_expand_ratio * cfg.width ** 2
             + cfg.width)
    attn = 4 * cfg.num_latents * cfg.width if dense else 0
    return 2 * g_lin + attn


def main():
    cfg = sv.FULL
    print(f"config: {cfg.num_latents} latents, width {cfg.width}, "
          f"octree {OCTREE}", flush=True)
    params = jax.jit(sv.init, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.num_latents, cfg.embed_dim))
    t0 = time.perf_counter()
    hidden = sv._decode_latents_jit(params, cfg, lat)
    kv = sv._compute_kv_jit(params, cfg, hidden)
    jax.block_until_ready(kv)
    print(f"latents→kv: {time.perf_counter() - t0:.2f}s (incl compile)",
          flush=True)

    from hunyuan3d2_tpu.volume.decoders import FlashVDMVolumeDecoding

    dec = FlashVDMVolumeDecoding()

    if MODE == "kernel":
        # microbench: the raw kernel on a fixed query tile stream
        from hunyuan3d2_tpu.ops.geo_decoder_pallas import fused_geo_decode_stream

        kv16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), kv)
        for p in (262144,):
            pts = jax.random.uniform(jax.random.PRNGKey(2), (1, p, 3),
                                     minval=-1.0, maxval=1.0)
            out = fused_geo_decode_stream(params, cfg, pts, kv16)
            np.asarray(out.ravel()[0])   # scalar read: hard barrier
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = fused_geo_decode_stream(params, cfg, pts, kv16)
                np.asarray(out.ravel()[0])
                ts.append(time.perf_counter() - t0)
            dt = sorted(ts)[1]
            fl = p * per_query_flops(cfg)
            print(f"kernel P={p}: {dt * 1e3:.1f} ms  "
                  f"{fl / dt / 1e12:.1f} TF/s  MFU {fl / dt / PEAK:.3f}",
                  flush=True)
        return

    def run(tag):
        sv._grid_decode_jit.clear_cache()
        t0 = time.perf_counter()
        out = sv._grid_decode_jit(params, cfg, kv, "flashvdm", OCTREE,
                                  NUM_CHUNKS, 1.01, 0.0, dec.block,
                                  dec.capacity_frac, dec.coarse_factor,
                                  "mesh", "mean")
        np.asarray(out[3])
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = sv._grid_decode_jit(params, cfg, kv, "flashvdm", OCTREE,
                                      NUM_CHUNKS, 1.01, 0.0, dec.block,
                                      dec.capacity_frac, dec.coarse_factor,
                                      "mesh", "mean")
            np.asarray(out[3])
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[1]
        nb = -(-(OCTREE + 1) // dec.block)
        ncp = nb * dec.coarse_factor + 1
        chunk = min(NUM_CHUNKS, ncp ** 3)
        coarse_q = -(-ncp ** 3 // chunk) * chunk
        fine_q = max(1, min(int(nb ** 3 * dec.capacity_frac), nb ** 3)) * dec.block ** 3
        fl = (coarse_q + fine_q) * per_query_flops(cfg, dense=(tag == "stream"))
        print(f"{tag}: decode+mesh {dt:.3f}s (compile {compile_s:.1f}s)  "
              f"{fl / 1e12:.1f} TF  MFU {fl / dt / PEAK:.3f}", flush=True)

    if MODE in ("both", "stream"):
        os.environ["HY3D_FUSED_GEO"] = "1"
        run("stream")
    if MODE in ("both", "pruned"):
        os.environ["HY3D_FUSED_GEO"] = "0"
        run("pruned")


if __name__ == "__main__":
    main()
