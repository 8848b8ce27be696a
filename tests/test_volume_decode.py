"""Volume decoder tests: the hierarchical block-sparse decoder must agree
with dense decoding near the surface (its whole point is to skip far-field
queries while preserving the zero crossing)."""

import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.volume.decoders import (
    FlashVDMVolumeDecoding,
    HierarchicalVolumeDecoding,
    VanillaVolumeDecoder,
    grid_coords_from_flat,
)


def sphere_decode_fn(pts):
    """[B,P,3] → [B,P] analytic occupancy logits."""
    return 0.6 - jnp.linalg.norm(pts, axis=-1)


def test_grid_coords_layout():
    res = 5
    flat = jnp.arange(res ** 3)
    pts = np.asarray(grid_coords_from_flat(flat, res, 1.0))
    lin = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    ref = np.stack([x, y, z], -1).reshape(-1, 3)
    np.testing.assert_allclose(pts, ref, atol=1e-6)


def test_vanilla_dense_decode():
    res = 32
    grid = np.asarray(VanillaVolumeDecoder()(
        sphere_decode_fn, batch_size=1, octree_resolution=res, num_chunks=997))
    assert grid.shape == (1, res + 1, res + 1, res + 1)
    lin = np.linspace(-1.01, 1.01, res + 1)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    ref = 0.6 - np.sqrt(x * x + y * y + z * z)
    np.testing.assert_allclose(grid[0], ref, atol=1e-5)


def test_hierarchical_matches_dense_near_surface():
    res = 64
    dense = np.asarray(VanillaVolumeDecoder()(
        sphere_decode_fn, batch_size=1, octree_resolution=res))[0]
    hier = np.asarray(HierarchicalVolumeDecoding(block=8, capacity_frac=0.3)(
        sphere_decode_fn, batch_size=1, octree_resolution=res))[0]
    assert hier.shape == dense.shape
    # exact agreement where |sdf| small (near surface: must be decoded finely)
    near = np.abs(dense) < 0.05
    assert near.sum() > 1000
    np.testing.assert_allclose(hier[near], dense[near], atol=1e-4)
    # sign agreement everywhere (background interpolation keeps the sign)
    signs_match = ((hier > 0) == (dense > 0))
    assert signs_match.mean() > 0.999, signs_match.mean()


def test_flashvdm_decoder_runs():
    res = 32
    out = np.asarray(FlashVDMVolumeDecoding()(
        sphere_decode_fn, batch_size=1, octree_resolution=res))
    assert out.shape == (1, res + 1, res + 1, res + 1)
    # isosurface location approximately right
    lin = np.linspace(-1.01, 1.01, res + 1)
    center = out[0, res // 2, res // 2, :]
    inside = lin[center > 0]
    assert 0.5 < np.abs(inside).max() < 0.7


def test_capped_actives_opt_in(monkeypatch):
    """HY3D_CAP_ACTIVES=1: active-cell overflow produces a bounded (holey)
    mesh from the first `capacity` cells instead of falling through to the
    exact dense path — the bench single-pass semantics (noise SDFs decode
    ~99% of cells active; the dense 385³ host mesh costs minutes)."""
    import jax

    from hunyuan3d2_tpu.models import shapevae as sv
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    pipe.enable_flashvdm(True, mc_algo="dmc")
    # shrink the static budget so a plain sphere SDF overflows it
    monkeypatch.setattr(sv, "active_capacity", lambda R: 64)
    monkeypatch.setenv("HY3D_CAP_ACTIVES", "1")
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (1, 16, pipe.vae.cfg.embed_dim))
    out = pipe.vae.latents2mesh(lat, octree_resolution=32, num_chunks=32768,
                                mc_algo="dmc")[0]
    # capped: at most one vertex per kept active cell, and a real mesh comes
    # back without the dense fallback (which would exceed 64 vertices)
    if out is not None:
        assert len(out.mesh_v) <= 64
        # the truncated device buffers must still be a consistent mesh:
        # every face references a kept vertex (quads touching dropped
        # cells are masked out by the emission, not clamped)
        if len(out.mesh_f):
            assert out.mesh_f.min() >= 0
            assert out.mesh_f.max() < len(out.mesh_v)
