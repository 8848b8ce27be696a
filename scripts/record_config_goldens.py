"""Record random-weight forward-pass goldens at the PRODUCTION configs.

VERDICT r3 weak #6: the always-on golden covered only the tiny CI config, so
a config-dependent numerics regression (the round-2 max_period bug class —
wrong only at real widths/depths or with optional embeddings enabled) could
pass every test. This records size/min/max/mean stats for deterministic
random-weight single forwards at the mini AND full shape configs, the
guidance-embedded DiT variant, and the full-size 2.5D paint UNet, frozen to
tests/goldens/config_forwards.json and replayed by tests/test_goldens.py.

Token/latent counts are kept small (the math being checked — widths, head
splits, rotary dims, embedding tables — does not depend on sequence length),
so the replay is seconds-scale on CPU despite the ~1B-param stacks.

Usage: python scripts/record_config_goldens.py [--out tests/goldens/config_forwards.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compute_config_goldens():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from hunyuan3d2_tpu.models import dit, paint_unet, shapevae as sv
    from hunyuan3d2_tpu.utils.debug import tensor_stats

    key = jax.random.PRNGKey(0)
    g = {}

    # --- DiT: mini, full, and the guidance-distilled (turbo) variant -----
    for name, cfg in (("dit_mini", dit.MINI), ("dit_full", dit.FULL),
                      ("dit_mini_guided",
                       dataclasses.replace(dit.MINI, guidance_embed=True))):
        params = dit.init(jax.random.PRNGKey(1), cfg)
        kx, kc = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(kx, (1, 64, cfg.in_channels), jnp.float32)
        cond = jax.random.normal(kc, (1, 16, cfg.context_in_dim), jnp.float32)
        t = jnp.array([0.5], jnp.float32)
        guidance = jnp.array([5.0], jnp.float32) if cfg.guidance_embed else None
        out = dit.apply(params, cfg, x, t, cond, guidance=guidance)
        g[name] = tensor_stats(out)
        del params

    # --- ShapeVAE: post-KL transformer + geo decoder at mini/full widths -
    for name, cfg in (("vae_mini", sv.MINI), ("vae_full", sv.FULL)):
        params = sv.init(jax.random.PRNGKey(3), cfg)
        lat = jax.random.normal(jax.random.PRNGKey(4), (1, 128, cfg.embed_dim),
                                jnp.float32)
        hidden = sv.decode_latents(params, cfg, lat)
        g[name + "_hidden"] = tensor_stats(hidden)
        kv = sv.compute_kv(params, cfg, hidden)
        q = jax.random.uniform(jax.random.PRNGKey(5), (1, 256, 3),
                               jnp.float32, -1.0, 1.0)
        logits = sv.decode_queries(params, cfg, q, kv)
        g[name + "_logits"] = tensor_stats(logits)
        del params

    # --- Paint UNet: the full 2.5D config (dual stream, camera embeds,
    # ref+mv attention, 12-ch conv_in) at a small latent size --------------
    cfg = paint_unet.DEFAULT
    params = paint_unet.init(jax.random.PRNGKey(6), cfg)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    sample = jax.random.normal(ks[0], (1, 2, 32, 32, 4), jnp.float32)
    normal = jax.random.normal(ks[1], (1, 2, 32, 32, 4), jnp.float32)
    position = jax.random.normal(ks[2], (1, 2, 32, 32, 4), jnp.float32)
    ref = jax.random.normal(ks[3], (1, 1, 32, 32, 4), jnp.float32)
    cam_gen = jnp.array([[5, 6]], jnp.int32)
    cam_ref = jnp.array([[0]], jnp.int32)
    noise_pred, _cache = paint_unet.apply(
        params, cfg, sample, jnp.float32(500.0), normal, position, ref,
        cam_gen, cam_ref)
    g["paint_unet_default"] = tensor_stats(noise_pred)
    return g


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "config_forwards.json"))
    args = ap.parse_args()
    g = compute_config_goldens()
    with open(args.out, "w") as fh:
        json.dump(g, fh, indent=1, sort_keys=True)
    print(f"wrote {len(g)} goldens to {args.out}")
    for k, v in sorted(g.items()):
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
