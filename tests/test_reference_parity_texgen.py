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
