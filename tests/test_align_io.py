"""ControlNet / IP-Adapter checkpoint maps: export → import round trip.

map_controlnet / map_ip_resampler / graft_ip_adapter_weights consume the
diffusers / original-IP-Adapter state-dict naming; the exporters are their
inverse. A round trip through the torch-layout dict (with its [out,in] /
[O,I,kh,kw] transposes) must reproduce the forward exactly.
"""

import numpy as np

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.io import diffusers_maps as dm
from hunyuan3d2_tpu.models import controlnet as cn
from hunyuan3d2_tpu.models import ip_adapter, paint_unet


def test_controlnet_roundtrip():
    ucfg = cn.TINY
    p = jax.jit(cn.init, static_argnums=1)(jax.random.PRNGKey(0), ucfg)
    # make the zero convs non-zero so the round trip is non-trivial
    rs = np.random.RandomState(0)
    p = jax.device_get(p)
    for zc in p["ctrl_down"]:
        zc["w"] = rs.randn(*zc["w"].shape).astype(np.float32) * 0.1
    p["ctrl_mid"]["w"] = rs.randn(*p["ctrl_mid"]["w"].shape).astype(
        np.float32) * 0.1

    sd = dm.export_controlnet(p)
    assert "controlnet_cond_embedding.conv_out.weight" in sd
    assert "controlnet_down_blocks.0.weight" in sd
    p2 = dm.map_controlnet(sd, ucfg, dtype="fp32")

    sample = jnp.asarray(rs.randn(1, 8, 8, 4), jnp.float32)
    t = jnp.asarray([10.0], jnp.float32)
    ctx = jnp.asarray(rs.randn(1, 77, ucfg.cross_attention_dim), jnp.float32)
    cond = jnp.asarray(rs.rand(1, 64, 64, 3), jnp.float32)

    def run(pp):
        pp = jax.tree.map(jnp.asarray, pp)
        d, m = cn.apply(pp, ucfg, sample, t, ctx, cond)
        return [np.asarray(x) for x in d] + [np.asarray(m)]

    for a, b in zip(run(p), run(p2)):
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_ip_adapter_roundtrip():
    ucfg = cn.TINY
    rcfg = ip_adapter.TINY
    up = jax.device_get(jax.jit(paint_unet.init, static_argnums=(1, 2))(
        jax.random.PRNGKey(1), ucfg, False))
    res = jax.device_get(ip_adapter.init_resampler(jax.random.PRNGKey(2),
                                                   rcfg))
    ip_adapter.add_ip_adapter(up, ucfg.cross_attention_dim)
    rs = np.random.RandomState(1)
    for blk in up["down"] + up["up"]:
        for t2d in blk["attns"]:
            a = t2d["block"]["attn2"]
            a["to_k_ip"] = {"w": rs.randn(
                *np.shape(a["to_k_ip"]["w"])).astype(np.float32) * 0.1}
            a["to_v_ip"] = {"w": rs.randn(
                *np.shape(a["to_v_ip"]["w"])).astype(np.float32) * 0.1}

    sd = dm.export_ip_adapter(up, res)
    assert "image_proj.latents" in sd and "ip_adapter.1.to_k_ip.weight" in sd
    # key ids are odd (diffusers attn2-only processor numbering)
    ids = sorted({int(k.split(".")[1]) for k in sd if k.startswith("ip_adapter.")})
    assert all(i % 2 == 1 for i in ids) and ids[0] == 1

    res2 = dm.map_ip_resampler(sd, dtype="fp32")
    x = jnp.asarray(rs.randn(1, 5, rcfg.embedding_dim), jnp.float32)
    o1 = np.asarray(ip_adapter.apply_resampler(
        jax.tree.map(jnp.asarray, res), rcfg, x))
    o2 = np.asarray(ip_adapter.apply_resampler(
        jax.tree.map(jnp.asarray, res2), rcfg, x))
    np.testing.assert_allclose(o1, o2, atol=2e-6)

    up2 = jax.device_get(jax.jit(paint_unet.init, static_argnums=(1, 2))(
        jax.random.PRNGKey(1), ucfg, False))
    dm.graft_ip_adapter_weights(up2, sd, dtype="fp32")
    sample = jnp.asarray(rs.randn(1, 8, 8, 4), jnp.float32)
    t = jnp.asarray([10.0], jnp.float32)
    ctx = jnp.asarray(rs.randn(1, 77, ucfg.cross_attention_dim), jnp.float32)
    ipc = jnp.asarray(rs.randn(1, 4, ucfg.cross_attention_dim), jnp.float32)

    def run(pp):
        pp = jax.tree.map(jnp.asarray, pp)
        return np.asarray(paint_unet.unet_apply(
            pp, ucfg, sample, t, ctx, None, "r", 1, {},
            ip_context=ipc, ip_scale=0.7))

    np.testing.assert_allclose(run(up), run(up2), atol=2e-5)
