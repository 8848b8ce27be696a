"""Voxel hierarchy builder (grid_neighbor parity) tests."""

import numpy as np

from hunyuan3d2_tpu.geometry.voxel_hierarchy import (
    build_hierarchy,
    key2pos,
    pos2key,
)


def test_key_roundtrip():
    rs = np.random.RandomState(0)
    pos = rs.rand(100, 3).astype(np.float32)
    keys = pos2key(pos, 64)
    back = key2pos(keys, 64)
    assert np.abs(back - pos).max() <= 1.0 / 64


def test_hierarchy_levels_and_parents():
    rs = np.random.RandomState(1)
    # points on a sphere surface
    v = rs.randn(5000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = (v * 0.4 + 0.5).astype(np.float32)
    normals = v.astype(np.float32)
    levels = build_hierarchy(pos, normals=normals, resolution=64, num_levels=3)
    assert len(levels) == 3
    assert levels[0].resolution == 64 and levels[2].resolution == 16
    # coarser levels have fewer voxels
    assert len(levels[0].keys) > len(levels[1].keys) > len(levels[2].keys)
    # parents resolve
    for lo, hi in zip(levels[:-1], levels[1:]):
        assert (lo.parent >= 0).all()
        # parent voxel contains the child center
        pk = pos2key(lo.positions, hi.resolution)
        np.testing.assert_array_equal(hi.keys[lo.parent], pk)
    # normals unit length
    n = levels[0].normals
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_neighbors_symmetric():
    pos = np.array([[0.1, 0.1, 0.1], [0.1, 0.1, 0.35], [0.9, 0.9, 0.9]],
                   np.float32)
    levels = build_hierarchy(pos, resolution=4, num_levels=1)
    nb = levels[0].neighbors
    # voxel 0 (0,0,0) and voxel 1 (0,0,1) are +z/-z neighbors
    assert nb[0, 4] == 1 and nb[1, 5] == 0
    # isolated voxel has none
    assert (nb[2] == -1).all()
