"""Direct-execution parity vs the ACTUAL reference — texgen host stack and
the FlashVDM decode machinery (VERDICT r3 #5).

Covers the reference files that are importable in this image but were not
previously executed by the suite:

* texgen/differentiable_renderer/camera_utils.py (get_mv_matrix :38,
  projections :75-101, transform_pos :22) vs geometry/camera.py
* texgen/differentiable_renderer/mesh_processor.py python twin (:17-87) vs
  the native hy3d_vertex_inpaint
* shapegen/models/autoencoders/attention_processors.py FlashVDM processors
  (:35-96) vs models/shapevae.decode_queries_pruned
* shapegen/models/autoencoders/volume_decoders.py near-surface mask (:29)
  vs the block-sparse selector's cell mask
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from tests.ref_loader import load_ref
from hunyuan3d2_tpu.geometry import camera
from hunyuan3d2_tpu.io import checkpoints
from hunyuan3d2_tpu.models import shapevae


# --------------------------------------------------------------------------
# camera math
# --------------------------------------------------------------------------

def test_reference_camera_matrices_parity():
    cu = load_ref("hy3dgen.texgen.differentiable_renderer.camera_utils")
    for elev, azim in [(0, 0), (0, 90), (0, 180), (0, 270), (90, 0),
                       (-90, 180), (20, 45), (-35, 310)]:
        ref = cu.get_mv_matrix(elev, azim, 1.45)
        ours = camera.get_mv_matrix(elev, azim, 1.45)
        np.testing.assert_allclose(ours, ref, atol=1e-6)
    ref = cu.get_mv_matrix(15, 60, 2.0, center=[0.1, -0.2, 0.3])
    ours = camera.get_mv_matrix(15, 60, 2.0, center=[0.1, -0.2, 0.3])
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    np.testing.assert_allclose(
        camera.ortho_projection(-1.2, 1.2, -0.8, 0.8, 0.1, 3.0),
        cu.get_orthographic_projection_matrix(-1.2, 1.2, -0.8, 0.8, 0.1, 3.0),
        atol=1e-7)
    np.testing.assert_allclose(
        camera.perspective_projection(49.1, 1.5, 0.01, 100.0),
        cu.get_perspective_projection_matrix(49.1, 1.5, 0.01, 100.0),
        rtol=1e-6)

    rs = np.random.RandomState(0)
    pos = rs.randn(17, 3).astype(np.float32)
    mv = cu.get_mv_matrix(20, 45, 1.45)
    ref_t = cu.transform_pos(mv, torch.tensor(pos)).numpy()[0]
    np.testing.assert_allclose(camera.transform_pos(mv, pos), ref_t,
                               atol=1e-5)


# --------------------------------------------------------------------------
# mesh_processor vertex inpaint (python twin :17-87 vs native C++)
# --------------------------------------------------------------------------

def _grid_mesh(n=8):
    """Small UV-mapped grid patch: vertex (i,j) → texel, two tris per quad."""
    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    vtx_pos = np.stack([ii / (n - 1), jj / (n - 1),
                        0.05 * np.sin(ii + 2 * jj)], axis=-1
                       ).reshape(-1, 3).astype(np.float32)
    # uv chosen so round(u*(W-1)), round((1-v)*(H-1)) hits unique texels
    vtx_uv = np.stack([jj / (n - 1), 1.0 - ii / (n - 1)], axis=-1
                      ).reshape(-1, 2).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    pos_idx = np.asarray(faces, np.int32)
    return vtx_pos, vtx_uv, pos_idx


def test_reference_mesh_processor_vertex_inpaint_exact_on_isolated_holes():
    """Isolated unpainted texels: every uncolored vertex's neighbors are all
    painted at sweep start, so the reference's in-sweep sequencing cannot
    matter — the inverse-square-distance weighted fill must match EXACTLY."""
    mp = load_ref("hy3dgen.texgen.differentiable_renderer.mesh_processor")
    from hunyuan3d2_tpu import native

    n = 8
    vtx_pos, vtx_uv, pos_idx = _grid_mesh(n)
    H = W = n  # one texel per vertex (uv maps (i,j) → texel (i,j))
    rs = np.random.RandomState(1)
    texture = rs.rand(H, W, 3).astype(np.float32)
    mask = np.full((H, W), 255, np.uint8)
    for (i, j) in [(2, 2), (5, 5), (1, 6)]:
        mask[i, j] = 0
        texture[i, j] = 0.0

    ref_tex, ref_mask = mp.meshVerticeInpaint(
        texture, mask, vtx_pos, vtx_uv, pos_idx, pos_idx)
    out_tex, out_mask = native.vertex_inpaint(
        texture, mask, vtx_pos, vtx_uv, pos_idx, pos_idx)
    np.testing.assert_array_equal(out_mask, ref_mask)
    assert (ref_mask > 0).all()
    np.testing.assert_allclose(out_tex, ref_tex, atol=1e-5)


def test_reference_mesh_processor_vertex_inpaint_wavefront_agreement():
    """Half-painted patch: the reference updates colors IN-SWEEP (python
    list order) while the native kernel level-orders the wavefront, so deep
    rings may differ in exact values — but the fill region (mask) must be
    identical and colors must stay close and inside the painted range."""
    mp = load_ref("hy3dgen.texgen.differentiable_renderer.mesh_processor")
    from hunyuan3d2_tpu import native

    n = 8
    vtx_pos, vtx_uv, pos_idx = _grid_mesh(n)
    H = W = n
    rs = np.random.RandomState(2)
    texture = rs.rand(H, W, 3).astype(np.float32)
    mask = np.zeros((H, W), np.uint8)
    mask[:, : W // 2] = 255          # left half painted
    texture[mask == 0] = 0.0

    ref_tex, ref_mask = mp.meshVerticeInpaint(
        texture, mask, vtx_pos, vtx_uv, pos_idx, pos_idx)
    out_tex, out_mask = native.vertex_inpaint(
        texture, mask, vtx_pos, vtx_uv, pos_idx, pos_idx)
    np.testing.assert_array_equal(out_mask, ref_mask)
    assert (ref_mask > 0).all()
    painted = texture[:, : W // 2]
    lo, hi = painted.min(), painted.max()
    filled = out_tex[:, W // 2:]
    assert (filled >= lo - 1e-5).all() and (filled <= hi + 1e-5).all()
    assert np.abs(out_tex - ref_tex).mean() < 0.08


# --------------------------------------------------------------------------
# FlashVDM attention processors vs decode_queries_pruned
# --------------------------------------------------------------------------

def _ref_vae_with_processor(processor, num_latents=48, width=32, heads=2):
    ab = load_ref("hy3dgen.shapegen.models.autoencoders.attention_blocks")
    nn = torch.nn

    class RefVAE(nn.Module):
        def __init__(self):
            super().__init__()
            self.fourier_embedder = ab.FourierEmbedder(num_freqs=8,
                                                       include_pi=False)
            self.post_kl = nn.Linear(8, width)
            self.transformer = ab.Transformer(
                n_ctx=num_latents, width=width, layers=2, heads=heads,
                qkv_bias=True, qk_norm=True)
            self.geo_decoder = ab.CrossAttentionDecoder(
                fourier_embedder=self.fourier_embedder, out_channels=1,
                num_latents=num_latents, mlp_expand_ratio=4,
                downsample_ratio=1, enable_ln_post=True, width=width,
                heads=heads, qkv_bias=True, qk_norm=True,
                label_type="binary")

        def forward(self, latents, queries):
            h = self.transformer(self.post_kl(latents))
            return self.geo_decoder(queries=queries, latents=h)

    torch.manual_seed(7)
    tm = RefVAE().eval()
    tm.geo_decoder.set_cross_attention_processor(processor)
    cfg = shapevae.ShapeVAEConfig(num_latents=num_latents, embed_dim=8,
                                  width=width, heads=heads,
                                  num_decoder_layers=2, scale_factor=1.0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32),
        checkpoints.map_shapevae(sd, cfg, np.float32))
    return tm, cfg, params


def _pruned_ours(params, cfg, latents, queries, k_top, group, mode):
    hidden = shapevae.decode_latents(params, cfg, jnp.asarray(latents))
    kv = shapevae.compute_kv(params, cfg, hidden)
    return np.asarray(shapevae.decode_queries_pruned(
        params, cfg, jnp.asarray(queries), kv, k_top, group, mode=mode))


def test_reference_flashvdm_mean_processor_parity():
    """FlashVDMCrossAttentionProcessor grouped-chunk mode (:58-71 + topk
    selection :73-81) executed through the real CrossAttentionDecoder vs our
    pruned decode with groups == reference chunks. L=48 → k rule L//3=16."""
    ap = load_ref("hy3dgen.shapegen.models.autoencoders.attention_processors")
    proc = ap.FlashVDMCrossAttentionProcessor()
    tm, cfg, params = _ref_vae_with_processor(proc)

    rs = np.random.RandomState(4)
    latents = rs.randn(1, cfg.num_latents, 8).astype(np.float32)
    queries = rs.uniform(-1.01, 1.01, (1, 1024, 3)).astype(np.float32)
    proc.topk = ([0, 1], torch.tensor([512, 512]))   # two 512-query chunks
    with torch.no_grad():
        ref = tm(torch.tensor(latents), torch.tensor(queries)).numpy()[..., 0]
    ours = _pruned_ours(params, cfg, latents, queries,
                        k_top=cfg.num_latents // 3, group=512, mode="mean")
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_reference_flashvdm_topm_processor_parity():
    """FlashVDMTopMCrossAttentionProcessor (:84-96): softmax-activation union
    over ::30-subsampled queries. With k_top=L our fixed-capacity top-k +
    −inf masking reproduces the reference's variable-length gather exactly
    (attention is invariant to dropping vs masking non-activated keys)."""
    ap = load_ref("hy3dgen.shapegen.models.autoencoders.attention_processors")
    proc = ap.FlashVDMTopMCrossAttentionProcessor()
    tm, cfg, params = _ref_vae_with_processor(proc)

    rs = np.random.RandomState(5)
    latents = rs.randn(1, cfg.num_latents, 8).astype(np.float32)
    queries = rs.uniform(-1.01, 1.01, (1, 1024, 3)).astype(np.float32)
    proc.topk = ([0, 1], torch.tensor([512, 512]))
    with torch.no_grad():
        ref = tm(torch.tensor(latents), torch.tensor(queries)).numpy()[..., 0]
    ours = _pruned_ours(params, cfg, latents, queries,
                        k_top=cfg.num_latents, group=512, mode="merge")
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


# --------------------------------------------------------------------------
# hierarchical near-surface mask coverage
# --------------------------------------------------------------------------

def test_reference_near_surface_mask_covered_by_block_selector():
    """Every point the reference's extract_near_surface_volume_fn (:29)
    marks must fall in a cell our _near_surface_blocks marks: the reference
    flags 6-neighbor sign disagreement at a point; any such edge is a corner
    disagreement of its incident cells, which is exactly our pre-dilation
    criterion (the dilation only widens coverage)."""
    vd = load_ref("hy3dgen.shapegen.models.autoencoders.volume_decoders")
    from hunyuan3d2_tpu.volume.decoders import _near_surface_blocks

    n = 33
    lin = np.linspace(-1.01, 1.01, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    grid = (0.6 - np.sqrt(x * x + y * y + z * z)).astype(np.float32)

    ref_mask = vd.extract_near_surface_volume_fn(
        torch.tensor(grid), 0.0).numpy() > 0                  # [n,n,n] points
    our_cells = np.asarray(_near_surface_blocks(
        jnp.asarray(grid)[None], 0.0)[0])                     # [n-1]³ cells

    pts = np.argwhere(ref_mask)
    assert len(pts) > 100
    covered = 0
    for px, py, pz in pts:
        c0 = np.maximum([px - 1, py - 1, pz - 1], 0)
        c1 = np.minimum([px, py, pz], n - 2)
        if our_cells[c0[0]:c1[0] + 1, c0[1]:c1[1] + 1, c0[2]:c1[2] + 1].any():
            covered += 1
    assert covered == len(pts), f"{len(pts) - covered} ref points uncovered"


# --------------------------------------------------------------------------
# paint 2.5D UNet wrapper — DIRECT execution of hunyuanpaint/unet/modules.py
# (VERDICT r4 #3: the paint stack was previously twin-tested only)
# --------------------------------------------------------------------------
from hunyuan3d2_tpu.models import paint_unet


def _load_paint_modules():
    from tests.ref_loader import paint_shim

    with paint_shim():
        return load_ref("hy3dgen.texgen.hunyuanpaint.unet.modules")


def _load_paint_pipeline():
    from tests.ref_loader import paint_shim

    with paint_shim():
        _load_paint_modules()
        return load_ref("hy3dgen.texgen.hunyuanpaint.pipeline")


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _fill_linear(tl, p):
    with torch.no_grad():
        tl.weight.copy_(_t(p["w"]).T)
        if tl.bias is not None:
            tl.bias.copy_(_t(p["b"]))


def _fill_attn(ta, p):
    _fill_linear(ta.to_q, p["to_q"])
    _fill_linear(ta.to_k, p["to_k"])
    _fill_linear(ta.to_v, p["to_v"])
    _fill_linear(ta.to_out[0], p["to_out"])


def _fill_ln(tn, p):
    with torch.no_grad():
        tn.weight.copy_(_t(p["scale"]))
        tn.bias.copy_(_t(p["bias"]))


def _make_ref_block(modules, p, cfg, dim, use_ma, use_ra, is_turbo=False):
    """Reference Basic2p5DTransformerBlock carrying OUR block weights. The
    inner BasicTransformerBlock/Attention are shim stand-ins implementing
    stock SD math (see ref_loader.paint_shim); everything the 2.5D wrapper
    adds — the 'w'/'r' condition cache, ref-attn, mv-attn with mask routing,
    residual scaling — is reference code (modules.py:125-300) executing
    unmodified."""
    heads = dim // cfg.attention_head_dim
    btb = modules.BasicTransformerBlock(
        dim, heads, cfg.attention_head_dim,
        cross_attention_dim=cfg.cross_attention_dim)
    _fill_ln(btb.norm1, p["norm1"])
    _fill_attn(btb.attn1, p["attn1"])
    _fill_ln(btb.norm2, p["norm2"])
    _fill_attn(btb.attn2, p["attn2"])
    _fill_ln(btb.norm3, p["norm3"])
    _fill_linear(btb.ff.net[0].proj, p["ff_in"])
    _fill_linear(btb.ff.net[2], p["ff_out"])
    blk = modules.Basic2p5DTransformerBlock(btb, "layer", use_ma, use_ra,
                                            is_turbo)
    if use_ra:
        _fill_attn(blk.attn_refview, p["attn_refview"])
    if use_ma:
        _fill_attn(blk.attn_multiview, p["attn_multiview"])
    return blk


def _tiny_cfg():
    return paint_unet.PaintUNetConfig(cross_attention_dim=32,
                                      attention_head_dim=16)


def test_reference_basic2p5d_write_read_cache_parity():
    """'w' pass (dual/writer block: use_ma=use_ra=False, modules.py:466-469
    init_attention defaults) fills condition_embed_dict with the POST-norm1
    hidden states (modules.py:181-186); the 'r' pass consumes it through
    attn_refview with ref_scale and runs mv-attn over the view-concatenated
    sequence with mva_scale (modules.py:188-243). Ours: paint_unet._tblock
    modes 'w'/'r'."""
    modules = _load_paint_modules()
    cfg = _tiny_cfg()
    dim, L, Ng = 64, 16, 3
    key = jax.random.PRNGKey(0)
    p = paint_unet._init_tblock(key, cfg, dim)
    p_dual = {k: v for k, v in p.items()
              if k not in ("attn_refview", "attn_multiview")}

    writer = _make_ref_block(modules, p_dual, cfg, dim, False, False)
    reader = _make_ref_block(modules, p, cfg, dim, True, True)

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    h_ref = jax.random.normal(ks[0], (1, L, dim), jnp.float32)
    ctx_ref = jax.random.normal(ks[1], (1, 7, cfg.cross_attention_dim))
    h_gen = jax.random.normal(ks[2], (Ng, L, dim), jnp.float32)
    ctx_gen = jax.random.normal(ks[3], (Ng, 7, cfg.cross_attention_dim))
    ref_scale, mva_scale = 0.9, 0.7

    cond = {}
    with torch.no_grad():
        ref_w = writer(
            _t(h_ref), encoder_hidden_states=_t(ctx_ref),
            cross_attention_kwargs=dict(
                mode="w", num_in_batch=1, condition_embed_dict=cond,
                mva_scale=1.0, ref_scale=1.0))
        ref_r = reader(
            _t(h_gen), encoder_hidden_states=_t(ctx_gen),
            cross_attention_kwargs=dict(
                mode="r", num_in_batch=Ng, condition_embed_dict=cond,
                mva_scale=mva_scale, ref_scale=ref_scale))

    dual_cfg = paint_unet.dual_config(cfg)
    cache = {}
    ours_w = paint_unet._tblock(p_dual, dual_cfg, h_ref, ctx_ref, "layer",
                                "w", 1, cache, 1.0, 1.0)
    ours_r = paint_unet._tblock(p, cfg, h_gen, ctx_gen, "layer",
                                "r", Ng, cache, ref_scale, mva_scale)

    np.testing.assert_allclose(np.asarray(ours_w), ref_w.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(cache["layer"]),
                               cond["layer"].numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_r), ref_r.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_reference_basic2p5d_turbo_masked_multiview_parity():
    """Turbo mode routes a voxel-locality boolean mask into mv-attn, selected
    by the concatenated sequence length (modules.py:210-231). The reference's
    turbo ref-attn is excluded here because it cannot execute (see
    test_reference_turbo_refattn_unbound_bug); use_ra=False isolates the mask
    machinery, which our masked Pallas flash path implements."""
    modules = _load_paint_modules()
    cfg = _tiny_cfg()
    dim, L, Ng = 64, 16, 3
    p = paint_unet._init_tblock(jax.random.PRNGKey(2), cfg, dim)
    reader = _make_ref_block(modules, p, cfg, dim, True, False,
                             is_turbo=True)

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    h_gen = jax.random.normal(ks[0], (Ng, L, dim), jnp.float32)
    ctx_gen = jax.random.normal(ks[1], (Ng, 7, cfg.cross_attention_dim))
    mask = np.asarray(
        jax.random.bernoulli(ks[2], 0.6, (1, Ng * L, Ng * L)))
    mask = mask | np.eye(Ng * L, dtype=bool)[None]   # keep rows attendable

    with torch.no_grad():
        ref_r = reader(
            _t(h_gen), encoder_hidden_states=_t(ctx_gen),
            cross_attention_kwargs=dict(
                mode="r", num_in_batch=Ng, condition_embed_dict={},
                position_attn_mask={Ng * L: torch.from_numpy(mask)},
                position_voxel_indices=None))

    cfg_no_ra = __import__("dataclasses").replace(
        cfg, use_reference_attention=False)
    ours_r = paint_unet._tblock(p, cfg_no_ra, h_gen, ctx_gen, "layer", "r",
                                Ng, {}, 1.0, 1.0,
                                mva_masks={Ng * L: jnp.asarray(mask)})
    np.testing.assert_allclose(np.asarray(ours_r), ref_r.numpy(),
                               rtol=2e-4, atol=2e-4)

    # wrong-seqlen mask dicts must be ignored by both (selection by length)
    with torch.no_grad():
        ref_nomask = reader(
            _t(h_gen), encoder_hidden_states=_t(ctx_gen),
            cross_attention_kwargs=dict(
                mode="r", num_in_batch=Ng, condition_embed_dict={},
                position_attn_mask={Ng * L + 5: torch.from_numpy(
                    np.ones((1, Ng * L + 5, Ng * L + 5), bool))},
                position_voxel_indices=None))
    ours_nomask = paint_unet._tblock(
        p, cfg_no_ra, h_gen, ctx_gen, "layer", "r", Ng, {}, 1.0, 1.0,
        mva_masks={Ng * L + 5: jnp.ones((1, Ng * L + 5, Ng * L + 5), bool)})
    np.testing.assert_allclose(np.asarray(ours_nomask), ref_nomask.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_reference_turbo_refattn_unbound_bug():
    """Pin a REFERENCE defect: Basic2p5DTransformerBlock.forward with
    is_turbo=True and use_ra=True raises UnboundLocalError — modules.py only
    binds ref_scale_timing under `if not self.is_turbo` (:196-199) but uses
    it unconditionally (:203). Turbo sets ref_scale=1.0 (:130-131), so our
    implementation applies the evident intent (unit ref scale); this test
    documents why turbo ref-attn cannot be direct-parity tested."""
    modules = _load_paint_modules()
    cfg = _tiny_cfg()
    dim, L, Ng = 64, 8, 2
    p = paint_unet._init_tblock(jax.random.PRNGKey(4), cfg, dim)
    blk = _make_ref_block(modules, p, cfg, dim, True, True, is_turbo=True)
    cond = {"layer": torch.randn(1, L, dim)}
    with pytest.raises(UnboundLocalError):
        blk(torch.randn(Ng, L, dim),
            encoder_hidden_states=torch.randn(Ng, 7, cfg.cross_attention_dim),
            cross_attention_kwargs=dict(
                mode="r", num_in_batch=Ng, condition_embed_dict=cond,
                position_attn_mask=None, position_voxel_indices=None))


def test_reference_voxel_mask_parity():
    """compute_multi_resolution_mask direct execution (modules.py:302-356)
    vs ours. The reference pools in fp16 and thresholds |d| < 1.73/g; ours
    pools in fp32 and thresholds d² — only pairs within fp16 rounding of the
    threshold may flip, so assert near-exact agreement plus exact dict
    keys."""
    modules = _load_paint_modules()
    b, n, h, w = 1, 4, 64, 64
    key = jax.random.PRNGKey(5)
    pos = jax.random.uniform(key, (b, n, h, w, 3), jnp.float32)
    # carve background regions (position == 1 in all channels)
    bg = jax.random.bernoulli(jax.random.PRNGKey(6), 0.3, (b, n, h, w, 1))
    pos = jnp.where(bg, 1.0, pos)

    ref_in = _t(np.transpose(np.asarray(pos), (0, 1, 4, 2, 3)))  # BNCHW
    ref = modules.compute_multi_resolution_mask(ref_in.clone(),
                                                grid_resolutions=[32, 16, 8])
    ours = paint_unet.compute_multi_resolution_mask(pos, (32, 16, 8))

    assert set(ours.keys()) == set(ref.keys())
    for k in ref:
        r = ref[k].numpy()
        o = np.asarray(ours[k])
        assert r.shape == o.shape
        agree = (r == o).mean()
        assert agree > 0.999, f"seqlen {k}: agreement {agree}"


def test_reference_voxel_indice_parity():
    """compute_discrete_voxel_indice + compute_multi_resolution_discrete_
    voxel_indice direct execution (modules.py:358-402) vs ours: same pooled
    positions rounded onto the voxel lattice; integer outputs must agree
    except where fp16-vs-fp32 pooling rounds a .5 boundary differently."""
    modules = _load_paint_modules()
    b, n, h, w = 1, 3, 64, 64
    pos = jax.random.uniform(jax.random.PRNGKey(7), (b, n, h, w, 3))
    bg = jax.random.bernoulli(jax.random.PRNGKey(8), 0.25, (b, n, h, w, 1))
    pos = jnp.where(bg, 1.0, pos)
    ref_in = _t(np.transpose(np.asarray(pos), (0, 1, 4, 2, 3)))

    ref = modules.compute_multi_resolution_discrete_voxel_indice(
        ref_in.clone(), grid_resolutions=[16, 8], voxel_resolutions=[128, 64])
    ours = paint_unet.compute_multi_resolution_discrete_voxel_indice(
        pos, (16, 8), (128, 64))

    assert set(ours.keys()) == set(ref.keys())
    for k in ref:
        assert ref[k]["voxel_resolution"] == ours[k]["voxel_resolution"]
        r = ref[k]["voxel_indices"].numpy()
        o = np.asarray(ours[k]["voxel_indices"])
        assert r.shape == o.shape
        agree = (r == o).mean()
        assert agree > 0.995, f"seqlen {k}: agreement {agree}"


def test_reference_ddim_solver_and_turbo_index_parity():
    """DDIMSolver (pipeline.py:139-160) + the turbo timestep-index trick
    (pipeline.py:598-603: index = range(29, 0, -3) into the 30-entry DDIM
    table) executed directly; our LCMScheduler.make_tables(10) must produce
    the identical [989 … 98] schedule, and our v-prediction step must match
    get_predicted_original_sample (:93-110) + DDIMSolver.ddim_step (:159)."""
    pl = _load_paint_pipeline()
    from hunyuan3d2_tpu.pipelines.paint_schedulers import LCMScheduler

    lcm = LCMScheduler()
    ac = lcm._alphas_cumprod().astype(np.float32)
    solver = pl.DDIMSolver(ac, timesteps=1000, ddim_timesteps=30)
    index = torch.arange(29, -1, -3).long()      # torch.range(29, 0, -3)
    ref_ts = solver.ddim_timesteps[index].numpy()

    ours_ts, ours_ac = lcm.make_tables(10)
    np.testing.assert_array_equal(ours_ts.astype(np.int64), ref_ts)
    np.testing.assert_array_equal(
        ref_ts, [989, 890, 791, 692, 593, 494, 395, 296, 197, 98])
    np.testing.assert_allclose(ours_ac, ac, rtol=1e-6)

    # one solver step: reference pred_x0 + ddim_step vs our LCM step fed the
    # PREDICTED noise (the deterministic DDIM jump the solver distills)
    n_gen = 2
    sample = torch.randn(n_gen, 4, 8, 8)
    model_out = torch.randn(n_gen, 4, 8, 8)
    i = 3                                         # table position (t=692)
    t = torch.full((1,), int(ref_ts[i]), dtype=torch.long)
    sqrt_ac = torch.from_numpy(np.sqrt(ac))
    sqrt_1mac = torch.from_numpy(np.sqrt(1.0 - ac))
    sample5 = sample.reshape(1, n_gen, 4, 8, 8)
    pred_x0 = pl.get_predicted_original_sample(
        model_out, t, sample5, "v_prediction", sqrt_ac, sqrt_1mac, n_gen)
    pred_eps = pl.get_predicted_noise(
        model_out, t, sample5, "v_prediction", sqrt_ac, sqrt_1mac, n_gen)
    # ddim_step indexes the solver's prev-table at the RAW ddim index
    ddim_i = torch.full((1,), int(index[i]), dtype=torch.long)
    x_prev = solver.ddim_step(pred_x0, pred_eps, ddim_i, n_gen)

    # ours: renoise pred_x0 to alpha_cumprods_prev[index[i]] — the solver's
    # "previous" entry is one DDIM-table slot down, i.e. t_next=table[idx-1]
    t_next = int(solver.ddim_timesteps[index[i] - 1])
    ours_prev, ours_x0 = lcm.step(
        jnp.asarray(model_out.numpy()), jnp.asarray(sample.numpy()),
        int(ref_ts[i]), t_next, jnp.asarray(ac),
        jnp.asarray(pred_eps.reshape(n_gen, 4, 8, 8).numpy()))
    np.testing.assert_allclose(
        np.asarray(ours_x0), pred_x0.reshape(n_gen, 4, 8, 8).numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours_prev), x_prev.reshape(n_gen, 4, 8, 8).numpy(),
        rtol=1e-4, atol=1e-5)
