"""Mesh container + OBJ/PLY/GLB round-trip tests."""

import numpy as np

from hunyuan3d2_tpu.geometry.mesh import Mesh


def _cube():
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                  [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.float32)
    f = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                  [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
                  [1, 2, 6], [1, 6, 5], [3, 0, 4], [3, 4, 7]], np.int32)
    return Mesh(v, f)


def test_obj_roundtrip(tmp_path):
    m = _cube()
    p = str(tmp_path / "c.obj")
    m.export(p)
    m2 = Mesh.load(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
    np.testing.assert_array_equal(m2.faces, m.faces)


def test_ply_roundtrip(tmp_path):
    m = _cube()
    m.vertex_colors = np.tile(np.array([[255, 0, 0]], np.uint8), (8, 1))
    p = str(tmp_path / "c.ply")
    m.export(p)
    m2 = Mesh.load(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
    np.testing.assert_array_equal(m2.faces, m.faces)
    assert m2.vertex_colors is not None


def test_glb_roundtrip_with_texture(tmp_path):
    m = _cube()
    m.uv = np.random.RandomState(0).rand(8, 2).astype(np.float32)
    m.texture = (np.random.RandomState(1).rand(16, 16, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "c.glb")
    m.export(p)
    m2 = Mesh.load(p)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
    np.testing.assert_array_equal(m2.faces, m.faces)
    np.testing.assert_allclose(m2.uv, m.uv, atol=1e-5)
    assert m2.texture is not None and m2.texture.shape == (16, 16, 3)


def test_glb_binary_structure(tmp_path):
    data = _cube().to_glb_bytes()
    assert data[:4] == b"glTF"
    assert len(data) % 4 == 0


def test_normals_and_winding():
    m = _cube()
    n = m.compute_vertex_normals()
    assert n.shape == (8, 3)
    # cube with outward winding: vertex normals point away from center
    c = m.vertices - 0.5
    assert ((n * c).sum(1) > 0).all()
    m.flip_winding()
    n2 = m.compute_vertex_normals()
    assert ((n2 * c).sum(1) < 0).all()


def test_remove_unreferenced():
    m = _cube()
    m.vertices = np.concatenate([m.vertices, [[9, 9, 9]]]).astype(np.float32)
    m.remove_unreferenced_vertices()
    assert len(m.vertices) == 8
