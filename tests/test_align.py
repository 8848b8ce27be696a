"""ControlNet + IP-Adapter align stack (models/controlnet.py,
models/ip_adapter.py, pipelines/align.py).

Parity strategy (diffusers is not installed in this image): the ControlNet /
IP-Adapter papers' defining structural invariants are pinned exactly —
zero-initialized control branches and adapters are exact no-ops (this is the
property the torch implementations rely on for finetune-from-base), and
breaking zero-init changes the output. The resampler is checked against an
inline torch twin. Reference: hy3dgen/texgen/utils/alignImg4Tex_utils.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.models import controlnet as cn
from hunyuan3d2_tpu.models import ip_adapter, paint_unet


@pytest.fixture(scope="module")
def tiny_stack():
    ucfg = cn.TINY
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    unet_params = jax.jit(paint_unet.init, static_argnums=(1, 2))(
        k1, ucfg, False)
    ctrl_params = jax.jit(cn.init, static_argnums=1)(k2, ucfg)
    rs = np.random.RandomState(0)
    sample = jnp.asarray(rs.randn(2, 8, 8, 4), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    ctx = jnp.asarray(rs.randn(2, 77, ucfg.cross_attention_dim), jnp.float32)
    cond = jnp.asarray(rs.rand(2, 64, 64, 3), jnp.float32)
    return ucfg, unet_params, ctrl_params, sample, t, ctx, cond


def test_controlnet_zero_init_is_identity(tiny_stack):
    """Zero convs ⇒ every residual is exactly 0 ⇒ controlled forward is
    bit-identical to the plain forward (the from-base finetune invariant)."""
    ucfg, up, cp, sample, t, ctx, cond = tiny_stack
    down, mid = cn.apply(cp, ucfg, sample, t, ctx, cond)
    assert all(float(jnp.abs(d).max()) == 0.0 for d in down)
    assert float(jnp.abs(mid).max()) == 0.0
    base = paint_unet.unet_apply(up, ucfg, sample, t, ctx, None, "r", 1, {})
    ctrl = paint_unet.unet_apply(up, ucfg, sample, t, ctx, None, "r", 1, {},
                                 ctrl_down=down, ctrl_mid=mid)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ctrl))


def test_controlnet_residual_count_matches_skips(tiny_stack):
    """One residual per skip entry: conv_in + layers_per_block per level +
    one per downsample (diffusers down_block_res_samples layout)."""
    ucfg, _, cp, sample, t, ctx, cond = tiny_stack
    down, _ = cn.apply(cp, ucfg, sample, t, ctx, cond)
    n = len(ucfg.block_out_channels)
    expect = 1 + n * ucfg.layers_per_block + (n - 1)
    assert len(down) == expect
    # spatial pyramid: halves at each downsample
    assert down[0].shape[1] == sample.shape[1]
    assert down[-1].shape[1] == sample.shape[1] // 2 ** (n - 1)


def test_controlnet_nonzero_changes_output(tiny_stack):
    ucfg, up, cp, sample, t, ctx, cond = tiny_stack
    cp2 = jax.tree.map(lambda x: x, cp)  # shallow copy of the tree
    cp2["ctrl_mid"] = {"w": jnp.ones_like(cp["ctrl_mid"]["w"]) * 0.1,
                       "b": cp["ctrl_mid"]["b"]}
    down, mid = cn.apply(cp2, ucfg, sample, t, ctx, cond)
    assert float(jnp.abs(mid).max()) > 0
    base = paint_unet.unet_apply(up, ucfg, sample, t, ctx, None, "r", 1, {})
    ctrl = paint_unet.unet_apply(up, ucfg, sample, t, ctx, None, "r", 1, {},
                                 ctrl_down=down, ctrl_mid=mid)
    assert float(jnp.abs(ctrl - base).max()) > 1e-6


def test_conditioning_scale_scales_residuals(tiny_stack):
    ucfg, _, cp, sample, t, ctx, cond = tiny_stack
    cp2 = jax.tree.map(lambda x: x, cp)
    cp2["ctrl_mid"] = {"w": jnp.ones_like(cp["ctrl_mid"]["w"]) * 0.1,
                       "b": cp["ctrl_mid"]["b"]}
    _, mid1 = cn.apply(cp2, ucfg, sample, t, ctx, cond,
                       conditioning_scale=1.0)
    _, mid5 = cn.apply(cp2, ucfg, sample, t, ctx, cond,
                       conditioning_scale=0.5)
    np.testing.assert_allclose(np.asarray(mid5), np.asarray(mid1) * 0.5,
                               rtol=1e-6)


def test_ip_adapter_zero_graft_is_identity(tiny_stack):
    """Zero to_k_ip/to_v_ip ⇒ the image branch contributes exactly 0."""
    ucfg, _, _, sample, t, ctx, _ = tiny_stack
    up2 = jax.jit(paint_unet.init, static_argnums=(1, 2))(
        jax.random.PRNGKey(0), ucfg, False)
    base = paint_unet.unet_apply(up2, ucfg, sample, t, ctx, None, "r", 1, {})
    ip_adapter.add_ip_adapter(up2, ucfg.cross_attention_dim)
    ip_ctx = jnp.ones((2, 4, ucfg.cross_attention_dim), jnp.float32)
    out = paint_unet.unet_apply(up2, ucfg, sample, t, ctx, None, "r", 1, {},
                                ip_context=ip_ctx, ip_scale=0.7)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


def test_ip_adapter_scale_and_effect(tiny_stack):
    ucfg, _, _, sample, t, ctx, _ = tiny_stack
    up2 = jax.jit(paint_unet.init, static_argnums=(1, 2))(
        jax.random.PRNGKey(0), ucfg, False)
    ip_adapter.add_ip_adapter(up2, ucfg.cross_attention_dim)
    # give the adapter real weights
    rs = np.random.RandomState(1)
    for blk in up2["down"]:
        for t2d in blk["attns"]:
            a = t2d["block"]["attn2"]
            a["to_k_ip"]["w"] = jnp.asarray(
                rs.randn(*a["to_k_ip"]["w"].shape) * 0.1, jnp.float32)
            a["to_v_ip"]["w"] = jnp.asarray(
                rs.randn(*a["to_v_ip"]["w"].shape) * 0.1, jnp.float32)
    ip_ctx = jnp.asarray(rs.randn(2, 4, ucfg.cross_attention_dim), jnp.float32)
    out0 = paint_unet.unet_apply(up2, ucfg, sample, t, ctx, None, "r", 1, {},
                                 ip_context=ip_ctx, ip_scale=0.0)
    base = paint_unet.unet_apply(up2, ucfg, sample, t, ctx, None, "r", 1, {})
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-6)
    out1 = paint_unet.unet_apply(up2, ucfg, sample, t, ctx, None, "r", 1, {},
                                 ip_context=ip_ctx, ip_scale=0.7)
    assert float(jnp.abs(out1 - base).max()) > 1e-6


def test_resampler_matches_torch_twin():
    """Perceiver resampler vs an inline torch twin (original IP-Adapter
    resampler.py semantics: q from latents, kv over [image tokens; latents],
    pre-norms, GELU FF, LayerNorm out)."""
    import torch

    cfg = ip_adapter.TINY
    p = ip_adapter.init_resampler(jax.random.PRNGKey(3), cfg)
    rs = np.random.RandomState(2)
    x = rs.randn(2, 6, cfg.embedding_dim).astype(np.float32)

    out = np.asarray(ip_adapter.apply_resampler(p, cfg, jnp.asarray(x)))

    def tt(a):  # jax/bf16 array -> f32 torch tensor
        return torch.tensor(np.asarray(a).astype(np.float32))

    def tl(pp):  # jax Linear dict -> torch linear apply
        w = tt(pp["w"])
        b = tt(pp["b"]) if "b" in pp else None
        return lambda v: v @ w + (b if b is not None else 0.0)

    def tln(pp, v):
        return torch.nn.functional.layer_norm(
            v, v.shape[-1:], tt(pp["scale"]), tt(pp["bias"]))

    xt = torch.tensor(x)
    lat = torch.tensor(np.asarray(p["latents"]))[None].repeat(2, 1, 1)
    xt = tl(p["proj_in"])(xt)
    h = cfg.heads
    hd = cfg.dim_head
    for lp in p["layers"]:
        xh = tln(lp["norm1"], xt)
        lh = tln(lp["norm2"], lat)
        kv_in = torch.cat([xh, lh], dim=1)
        q = tl(lp["to_q"])(lh)
        k, v = tl(lp["to_kv"])(kv_in).chunk(2, dim=-1)

        def heads_(z):
            return z.reshape(z.shape[0], z.shape[1], h, hd).transpose(1, 2)

        o = torch.nn.functional.scaled_dot_product_attention(
            heads_(q).float(), heads_(k).float(), heads_(v).float())
        o = o.transpose(1, 2).reshape(2, lat.shape[1], h * hd)
        lat = lat + tl(lp["to_out"])(o)
        lh = tln(lp["ff_norm"], lat)
        lat = lat + tl(lp["ff_out"])(
            torch.nn.functional.gelu(tl(lp["ff_in"])(lh)))
    ref = tln(p["norm_out"], tl(p["proj_out"])(lat)).numpy()
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_image_proj_plain():
    p = ip_adapter.init_image_proj(jax.random.PRNGKey(0), 16, 8, num_tokens=4)
    pooled = jnp.asarray(np.random.RandomState(0).randn(3, 16), jnp.float32)
    out = ip_adapter.apply_image_proj(p, pooled)
    assert out.shape == (3, 4, 8)
    # LayerNorm applied per token row
    assert abs(float(out.mean(-1)[0, 0])) < 1e-5


def test_align_pipeline_e2e_tiny():
    from PIL import Image

    from hunyuan3d2_tpu.pipelines.align import ControlNetSDPipeline

    pipe = ControlNetSDPipeline.init_random(resolution=32)
    rs = np.random.RandomState(0)
    depth = Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8))
    ip_img = Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8))
    out = pipe(prompt="", control_image=depth, ip_adapter_image=ip_img,
               num_inference_steps=3, seed=0)
    assert out.size == (32, 32)


def test_reference_contract_classes():
    """Img2img_Control_Ip_adapter / HesModel keep the reference call
    signatures (alignImg4Tex_utils.py:36-49, :96-106)."""
    from PIL import Image

    from hunyuan3d2_tpu.utils.align_img4tex import (
        HesModel,
        Img2img_Control_Ip_adapter,
    )

    rs = np.random.RandomState(0)
    depth = Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8))
    init = Image.fromarray((rs.rand(32, 32, 3) * 255).astype(np.uint8))

    m = Img2img_Control_Ip_adapter(device=None)
    m.pipeline.resolution = 32
    out = m("a chair", depth, init, "", height=32, width=32,
            num_inference_steps=2)
    assert out.size == (32, 32)

    hes = HesModel(pipeline=m.pipeline)
    out2 = hes(init_image=init, control_image=depth, ip_adapter_image=init,
               strength=0.5, num_inference_steps=4)
    assert out2.size == (32, 32)


def test_img2img_strength_skips_steps():
    """strength<1 starts from the noised init image at the right index —
    with strength→0 (t_start = N) the output equals the VAE round-trip of
    the init image (no denoise steps run)."""
    from PIL import Image

    from hunyuan3d2_tpu.models import sd_vae
    from hunyuan3d2_tpu.pipelines.align import ControlNetSDPipeline

    pipe = ControlNetSDPipeline.init_random(resolution=32)
    rs = np.random.RandomState(0)
    arr = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
    init = Image.fromarray(arr)
    depth = Image.fromarray(arr)
    out = np.asarray(pipe(control_image=depth, init_image=init,
                          strength=1e-9, num_inference_steps=4, seed=0,
                          output_type="np"))
    x = jnp.asarray(arr, jnp.float32)[None] / 255.0 * 2.0 - 1.0
    lat = sd_vae.encode(pipe.vae_params, pipe.vcfg, x.astype(jnp.bfloat16))
    rt = np.asarray(jnp.clip(sd_vae.decode(
        pipe.vae_params, pipe.vcfg, lat).astype(jnp.float32), -1, 1))
    rt01 = (rt[0] + 1.0) / 2.0
    # bf16 decode vs f32-latent decode round-trip: tolerance is bf16-level
    np.testing.assert_allclose(out, rt01, atol=5e-2)
    assert float(np.abs(out - rt01).mean()) < 5e-3
