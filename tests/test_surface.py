"""Surface extraction correctness on analytic SDFs."""

import numpy as np

from hunyuan3d2_tpu.volume.surface import (
    MarchingTetrahedraExtractor,
    SurfaceNetsExtractor,
    SurfaceExtractors,
)


def sphere_grid(res=48, radius=0.6, box_v=1.01):
    lin = np.linspace(-box_v, box_v, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    # occupancy-logit convention: positive inside
    return (radius - np.sqrt(x * x + y * y + z * z))[None].astype(np.float32)


def _mesh_checks(out, radius, box_v=1.01, area_tol=0.15):
    assert out is not None
    v, f = out.mesh_v, out.mesh_f
    assert len(v) > 100 and len(f) > 100
    # all vertices near the sphere surface
    r = np.linalg.norm(v, axis=1)
    assert np.abs(r - radius).max() < 0.08, np.abs(r - radius).max()
    # total area ≈ 4πr²
    e1 = v[f[:, 1]] - v[f[:, 0]]
    e2 = v[f[:, 2]] - v[f[:, 0]]
    cr = np.cross(e1, e2)
    area = 0.5 * np.linalg.norm(cr, axis=1).sum()
    ref = 4 * np.pi * radius ** 2
    assert abs(area - ref) / ref < area_tol, (area, ref)
    # outward orientation: normals point away from the center
    cent = (v[f[:, 0]] + v[f[:, 1]] + v[f[:, 2]]) / 3
    dots = (cr * cent).sum(1)
    frac_out = (dots > 0).mean()
    return frac_out


def test_marching_tetrahedra_sphere():
    grid = sphere_grid()
    out = MarchingTetrahedraExtractor()(grid, mc_level=0.0, box_v=1.01)[0]
    frac_out = _mesh_checks(out, 0.6)
    assert frac_out > 0.99, frac_out


def test_marching_tetrahedra_watertight():
    """Every edge must be shared by exactly 2 faces (closed 2-manifold)."""
    grid = sphere_grid(res=24)
    out = MarchingTetrahedraExtractor()(grid, mc_level=0.0)[0]
    f = out.mesh_f
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), np.unique(counts)


def test_surface_nets_sphere():
    grid = sphere_grid()
    out = SurfaceNetsExtractor()(grid, mc_level=0.0, box_v=1.01)[0]
    frac_out = _mesh_checks(out, 0.6)
    assert frac_out > 0.99, frac_out


def test_registry_and_failure_degrades_to_none():
    assert set(SurfaceExtractors) >= {"mc", "dmc"}
    empty = np.full((1, 8, 8, 8), -1.0, np.float32)  # nothing inside
    out = SurfaceExtractors["mc"]()(empty, mc_level=0.0)[0]
    # empty grid → empty mesh is fine; must not raise
    assert out is None or len(out.mesh_v) == 0
