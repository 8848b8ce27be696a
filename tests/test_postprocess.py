"""Native library + postprocessor tests."""

import numpy as np
import pytest

from hunyuan3d2_tpu import native
from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.geometry.postprocess import (
    DegenerateFaceRemover,
    FaceReducer,
    FloaterRemover,
    MeshSimplifier,
    mesh_normalize,
)
from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor


def _sphere_mesh(res=48, radius=0.6):
    lin = np.linspace(-1.01, 1.01, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = (radius - np.sqrt(x * x + y * y + z * z))[None].astype(np.float32)
    out = SurfaceNetsExtractor()(g, mc_level=0.0)[0]
    return Mesh(out.mesh_v, out.mesh_f)


def test_floater_remover():
    m = _sphere_mesh()
    nf = len(m.faces)
    # add a tiny floating triangle far away
    base = len(m.vertices)
    m.vertices = np.concatenate(
        [m.vertices, [[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5]]]).astype(np.float32)
    m.faces = np.concatenate([m.faces, [[base, base + 1, base + 2]]]).astype(np.int32)
    out = FloaterRemover()(m)
    assert len(out.faces) == nf
    assert np.abs(out.vertices).max() < 2


def test_degenerate_face_remover():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 2], [0, 1, 1], [3, 1, 2]], np.int32)
    out = DegenerateFaceRemover()(Mesh(v, f))
    # dup vertex 3 welds into 0; dup faces and zero-area collapse to one face
    assert len(out.faces) == 1
    assert len(out.vertices) == 3


def test_weld_dedup_matches_numpy_twin():
    rng = np.random.RandomState(0)
    base = rng.rand(200, 3).astype(np.float32)
    # duplicate a third of the vertices exactly
    v = np.concatenate([base, base[:70]]).astype(np.float32)
    f = rng.randint(0, len(v), (400, 3)).astype(np.int32)
    out_v, out_f = native.weld_dedup(v, f)
    # numpy twin
    uniq, inv = np.unique(v, axis=0, return_inverse=True)
    g = inv[f].astype(np.int32)
    ok = (g[:, 0] != g[:, 1]) & (g[:, 1] != g[:, 2]) & (g[:, 0] != g[:, 2])
    g = g[ok]
    e1 = uniq[g[:, 1]] - uniq[g[:, 0]]
    e2 = uniq[g[:, 2]] - uniq[g[:, 0]]
    g = g[np.linalg.norm(np.cross(e1, e2), axis=1) > 1e-12]
    key = np.sort(g, axis=1)
    _, first = np.unique(key, axis=0, return_index=True)
    g = g[np.sort(first)]
    assert len(out_v) == len(uniq)
    assert len(out_f) == len(g)
    # same face sets (orderings differ: ours keeps first occurrence of
    # original vertex order, numpy sorts) — compare welded positions per face
    ours = np.sort(out_v[out_f].reshape(len(out_f), -1), axis=1)
    ref = np.sort(uniq[g].reshape(len(g), -1), axis=1)
    assert np.allclose(np.sort(ours, axis=0), np.sort(ref, axis=0))


def test_weld_dedup_negative_zero():
    """-0.0 and +0.0 coordinates must weld together (np.unique compares them
    equal); regression for the raw-bit-pattern hash (advisor round-2 low)."""
    v = np.array([[0.0, 1, 2], [-0.0, 1, 2], [3, 4, 5]], np.float32)
    assert np.signbit(v[1, 0])
    f = np.array([[0, 1, 2], [1, 0, 2]], np.int32)
    out_v, out_f = native.weld_dedup(v, f)
    assert len(out_v) == 2          # the two zeros weld
    assert len(out_f) == 0          # both faces become degenerate


def test_cluster_decimate_sphere():
    m = _sphere_mesh(res=96)
    v, f = native.cluster_decimate(m.vertices, m.faces, 0.08)
    assert len(f) < len(m.faces) * 0.2
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 0.6) < 0.03


def test_face_reducer_large_input_uses_cluster_prepass():
    m = _sphere_mesh(res=128)
    assert len(m.faces) > 8 * 2000
    out = FaceReducer()(m, max_facenum=2000)
    assert len(out.faces) <= 2200
    r = np.linalg.norm(out.vertices, axis=1)
    assert abs(r.mean() - 0.6) < 0.03
    assert r.std() < 0.03


def test_face_reducer_preserves_shape():
    m = _sphere_mesh()
    out = FaceReducer()(m, max_facenum=800)
    assert len(out.faces) <= 900
    r = np.linalg.norm(out.vertices, axis=1)
    assert abs(r.mean() - 0.6) < 0.03
    assert r.std() < 0.03


def test_mesh_simplifier_ratio():
    m = _sphere_mesh()
    out = MeshSimplifier()(m, ratio=0.1)
    assert len(out.faces) < len(m.faces) * 0.2


def test_mesh_normalize():
    m = _sphere_mesh()
    m.vertices = m.vertices * 3 + 1
    out = mesh_normalize(m)
    assert np.abs(out.vertices).max() <= 0.99 + 1e-5


def test_rasterizer_depth_and_tiebreak():
    # two overlapping triangles: nearer one must win everywhere they overlap
    v = np.array([
        [-1, -1, 0.8, 1], [1, -1, 0.8, 1], [0, 1, 0.8, 1],   # far
        [-1, -1, 0.2, 1], [1, -1, 0.2, 1], [0, 1, 0.2, 1],   # near
    ], np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    fid, bary, depth = native.rasterize(v, f, 32, 32)
    cover = fid >= 0
    assert cover.sum() > 100
    assert (fid[cover] == 1).all()          # near triangle wins
    # depth output is NDC z remapped from [-1,1] to [0,1]: 0.2 → 0.6
    np.testing.assert_allclose(depth[cover], 0.6, atol=1e-3)
    # identical depth → lowest face id wins (deterministic tie-break)
    v2 = v.copy()
    v2[3:, 2] = 0.8
    fid2, _, _ = native.rasterize(v2, f, 32, 32)
    assert (fid2[fid2 >= 0] == 0).all()
