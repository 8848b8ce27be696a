"""On-TPU (Pallas) rasterizer + texture-space bake vs the host renderer.

Runs on the CPU test mesh via the Pallas interpreter (rasterize_tpu
auto-selects interpret mode off-TPU); the same code paths run compiled on
the real chip."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from hunyuan3d2_tpu.geometry import camera as cam
from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.geometry.render import MeshRender
from hunyuan3d2_tpu.geometry.render_tpu import (
    bake_tpu,
    cond_maps_tpu,
    upload_mesh,
)
from hunyuan3d2_tpu.geometry.uv import mesh_uv_wrap
from hunyuan3d2_tpu.ops.rasterize_tpu import interpolate, rasterize_tpu
from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor
from hunyuan3d2_tpu import native


def _sphere_mesh(res=40, radius=0.6):
    lin = np.linspace(-1.01, 1.01, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = (radius - np.sqrt(x * x + y * y + z * z))[None].astype(np.float32)
    out = SurfaceNetsExtractor()(g, mc_level=0.0)[0]
    return Mesh(out.mesh_v, out.mesh_f)


def test_rasterize_tpu_matches_host_kernel():
    """Pixel-exact face-id parity with the native C++ z-buffer kernel on a
    random triangle soup plus a screen-covering 'big' face (exercises the
    global-bin path)."""
    rs = np.random.RandomState(0)
    V, F = 1500, 1000
    verts = rs.uniform(-0.9, 0.9, (V, 4)).astype(np.float32)
    verts[:, 2] = rs.uniform(0.1, 0.9, V)
    verts[:, 3] = 1.0
    big = np.array([[-0.95, -0.95, 0.95, 1.0], [0.95, -0.95, 0.95, 1.0],
                    [0.0, 0.95, 0.95, 1.0]], np.float32)
    verts = np.concatenate([verts, big])
    faces = np.concatenate([rs.randint(0, V, (F, 3)),
                            [[V, V + 1, V + 2]]]).astype(np.int32)
    h = w = 256
    fid_h, bary_h, depth_h = native.rasterize(verts, faces, h, w)
    out = rasterize_tpu(jnp.asarray(verts), jnp.asarray(faces), h, w,
                        k_cap=2048)
    assert (np.asarray(out.overflow) <= 0).all()
    fid_d = np.asarray(out.face_id)
    # fp32 vs quantized-uint32 depth compare: allow a vanishing mismatch
    assert (fid_d != fid_h).mean() < 1e-3
    same = fid_d == fid_h
    assert np.abs(np.asarray(out.depth) - depth_h)[same].max() < 1e-4
    assert np.abs(np.asarray(out.bary) - bary_h)[same].max() < 1e-3
    # interpolation matches the host fused interp
    attrs = rs.rand(len(verts), 5).astype(np.float32)
    img_d = np.asarray(interpolate(out, jnp.asarray(faces),
                                   jnp.asarray(attrs)))
    _, _, _, img_h = native.rasterize_interp(verts, faces, attrs, h, w)
    img_h[fid_h < 0] = 0
    assert np.abs(img_d - img_h)[same].max() < 1e-3


def test_overflow_detected_and_auto_cap_prevents_it():
    """A too-small explicit k_cap must be reported in RasterOut.overflow and
    raise through check_overflow (→ texgen host fallback); the default
    auto-sized k_cap must cover the same mesh with no overflow. Regression
    for the silently-truncating 4096 default (advisor round-2 high)."""
    from hunyuan3d2_tpu.ops.rasterize_tpu import (
        RasterOverflowError,
        auto_k_cap,
        check_overflow,
    )

    rs = np.random.RandomState(1)
    V, F = 600, 400
    verts = rs.uniform(-0.5, 0.5, (V, 4)).astype(np.float32)
    verts[:, 2] = rs.uniform(0.2, 0.8, V)
    verts[:, 3] = 1.0
    faces = rs.randint(0, V, (F, 3)).astype(np.int32)
    # one 128-tile grid → all faces land in few tiles; k_cap=32 overflows
    out = rasterize_tpu(jnp.asarray(verts), jnp.asarray(faces), 128, 128,
                        k_cap=32)
    assert int(np.asarray(out.overflow)[0]) > 0
    with pytest.raises(RasterOverflowError):
        check_overflow(out.overflow)
    # default auto cap: covers every face on small grids → never overflows
    assert auto_k_cap(F, 1) >= F
    assert auto_k_cap(40960, 16) >= 40960          # 512² cond-map grid
    out2 = rasterize_tpu(jnp.asarray(verts), jnp.asarray(faces), 128, 128)
    assert (np.asarray(out2.overflow) <= 0).all()
    check_overflow(out2.overflow)  # no raise


def test_cond_maps_tpu_match_host_renderer():
    """Device normal+position cond maps vs MeshRender.render_normal_position
    away from silhouette edges."""
    m = _sphere_mesh()
    r = MeshRender(default_resolution=256, texture_size=128)
    r.load_mesh(m)
    dev = upload_mesh(r)
    assert dev is not None
    views = [(0, 0), (0, 90), (90, 0)]
    mvps = np.stack([r._mvp(e, a)[1] for e, a in views])
    nrm_d, pos_d = cond_maps_tpu(dev, jnp.asarray(mvps), 256)
    for i, (e, a) in enumerate(views):
        nm, pm = r.render_normal_position(e, a, resolution=256)
        mask = nm[..., 3] > 0
        # erode the comparison region: silhouette pixels rasterize
        # fractionally differently
        interior = mask.copy()
        interior[1:] &= mask[:-1]
        interior[:-1] &= mask[1:]
        interior[:, 1:] &= mask[:, :-1]
        interior[:, :-1] &= mask[:, 1:]
        nd = np.asarray(nrm_d[i], np.float32) / 255.0
        pd = np.asarray(pos_d[i], np.float32) / 255.0
        assert np.abs(nd - nm[..., :3])[interior].mean() < 0.01
        assert np.abs(pd - pm[..., :3])[interior].mean() < 0.01
        # background is white in both
        assert (nd[~mask] > 0.95).all()


def test_bake_tpu_red_roundtrip_and_host_agreement():
    """Bake six solid-red views → trusted texels must be red; and on
    textured random views the device gather bake must agree with the host
    splat bake on mutually trusted texels."""
    m = mesh_uv_wrap(_sphere_mesh())
    r = MeshRender(default_resolution=160, texture_size=96)
    r.load_mesh(m)
    dev = upload_mesh(r)
    assert dev is not None
    views = [(0, 0), (0, 90), (0, 180), (0, 270), (90, 0), (-90, 180)]
    elevs = [e for e, _ in views]
    azims = [a for _, a in views]
    weights = [1, 0.1, 0.5, 0.1, 0.05, 0.05]
    mvs = np.stack([r._mvp(e, a)[0] for e, a in views])
    mvps = np.stack([r._mvp(e, a)[1] for e, a in views])

    red = np.zeros((6, 80, 80, 3), np.uint8)
    red[..., 0] = 255
    tex, trust = bake_tpu(dev, jnp.asarray(mvs), jnp.asarray(mvps),
                          jnp.asarray(red), jnp.asarray(weights, jnp.float32),
                          render_res=160, tex_res=96, exp=4)
    tex = np.asarray(tex)
    trust = np.asarray(trust)
    assert (trust > 0).mean() > 0.2
    sel = trust > 0
    np.testing.assert_allclose(tex[sel][:, 0], 1.0, atol=0.02)
    np.testing.assert_allclose(tex[sel][:, 1], 0.0, atol=0.02)

    # smooth (realistic) views: compare against the host fused bake — the
    # gather discretization samples where the splat averages, so agreement
    # is only meaningful for smooth view content
    gy, gx = np.mgrid[0:80, 0:80].astype(np.float32) / 79.0
    views_u8 = np.stack([
        np.stack([gx * 255, gy * 255, (i / 5.0) * np.ones_like(gx) * 255],
                 axis=-1).astype(np.uint8)
        for i in range(6)])
    geom = r.prepare_bake_geometry(elevs, azims)
    host_tex, host_mask = r.bake_texture_prepared(views_u8, geom, exp=4,
                                                  weights=weights)
    dev_tex, dev_trust = bake_tpu(
        dev, jnp.asarray(mvs), jnp.asarray(mvps), jnp.asarray(views_u8),
        jnp.asarray(weights, jnp.float32), render_res=160, tex_res=96, exp=4)
    both = (np.asarray(dev_trust) > 1e-3) & host_mask[..., 0]
    assert both.mean() > 0.15
    diff = np.abs(np.asarray(dev_tex) - host_tex)[both]
    # different discretizations (gather vs splat) — close on average
    assert diff.mean() < 0.03


def test_mesh_bucketing_reuses_compiled_programs():
    """Serving contract: meshes with different raw (V, F) but the same face
    budget must reuse ONE compiled raster/bake program (upload_mesh buckets
    shapes; UV-wrapped meshes pin V to 3x the face bucket). Without this,
    every request recompiled the stack (~50 s on the remote TPU tunnel)."""
    from hunyuan3d2_tpu.geometry.render_tpu import (
        _cond_map_view,
        _uv_geometry,
        prepare_bake_tpu,
    )
    from hunyuan3d2_tpu.geometry.uv import mesh_uv_wrap

    meshes = [_sphere_mesh(res=24, radius=0.6), _sphere_mesh(res=26, radius=0.5)]
    shapes_geo, shapes_uvm = set(), set()
    base_cond = _cond_map_view._cache_size()
    base_uvg = _uv_geometry._cache_size()
    for m in meshes:
        r = MeshRender(default_resolution=128, texture_size=64)
        r.load_mesh(m)
        dev = upload_mesh(r)
        shapes_geo.add((int(dev.verts.shape[0]), int(dev.faces.shape[0])))
        mvp = jnp.asarray(r._mvp(0, 0)[1])
        nrm, pos, _ = _cond_map_view(dev, mvp, 64)
        assert nrm.shape == (64, 64, 3)

        w = mesh_uv_wrap(m)
        r.load_mesh(w)
        devu = upload_mesh(r, need_uv=True)
        assert devu is not None
        shapes_uvm.add((int(devu.verts.shape[0]), int(devu.faces.shape[0])))
        assert devu.verts.shape[0] == 3 * devu.faces.shape[0]
        assert devu.uv.shape[0] == devu.verts.shape[0]
        tp, tn, tv, _ = _uv_geometry(devu, 64)
        assert tp.shape == (64, 64, 3)
    # different meshes, same buckets -> the jitted programs were reused
    assert len(shapes_geo) == 1, shapes_geo
    assert len(shapes_uvm) == 1, shapes_uvm
    # both meshes hit ONE new compiled program each
    assert _cond_map_view._cache_size() - base_cond == 1
    assert _uv_geometry._cache_size() - base_uvg == 1
