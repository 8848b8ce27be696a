"""On-device active-cell extraction path: must produce the same mesh as the
dense host path."""

import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.volume.decoders import extract_active_cells
from hunyuan3d2_tpu.volume.surface import (
    SurfaceNetsExtractor,
    MarchingTetrahedraExtractor,
    _active_cells,
)


def _sphere_grid(res=48, radius=0.6, box_v=1.01):
    lin = np.linspace(-box_v, box_v, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return (radius - np.sqrt(x * x + y * y + z * z)).astype(np.float32)


def test_extract_active_cells_matches_host_detection():
    grid = _sphere_grid()
    cell_flat, vals, count = extract_active_cells(jnp.asarray(grid), 0.0, 200000)
    count = int(count)
    ref_cells = _active_cells(grid, 0.0)
    assert count == len(ref_cells)
    nc = grid.shape[0] - 1
    got = np.asarray(cell_flat)[:count]
    ref = (ref_cells[:, 0] * nc + ref_cells[:, 1]) * nc + ref_cells[:, 2]
    np.testing.assert_array_equal(np.sort(got), np.sort(ref))
    # ascending order (host builders rely on it)
    assert (np.diff(got) > 0).all()
    # padding is -1
    assert (np.asarray(cell_flat)[count:] == -1).all()


def test_actives_mesh_equals_dense_mesh():
    grid = _sphere_grid()
    R = grid.shape[0]
    cell_flat, vals, count = extract_active_cells(jnp.asarray(grid), 0.0, 200000)
    for ex_cls in (SurfaceNetsExtractor, MarchingTetrahedraExtractor):
        ex = ex_cls()
        if ex_cls is SurfaceNetsExtractor:
            ex.use_native = False  # compare pure-numpy against actives path
        dense = ex(grid[None], mc_level=0.0, box_v=1.01)[0]
        sparse = ex.from_actives(cell_flat, vals, int(count), R, 0.0, 1.01)
        assert len(sparse.mesh_v) == len(dense.mesh_v)
        assert len(sparse.mesh_f) == len(dense.mesh_f)
        # vertex positions agree within f16 interpolation noise
        np.testing.assert_allclose(
            np.sort(sparse.mesh_v.ravel()), np.sort(dense.mesh_v.ravel()),
            atol=2e-3)


def test_capacity_overflow_detectable():
    grid = _sphere_grid()
    cell_flat, vals, count = extract_active_cells(jnp.asarray(grid), 0.0, 100)
    assert int(count) > 100  # caller must detect and fall back


def test_mt_from_actives_watertight():
    """The default 'mc' extractor through the on-device actives path must
    still produce a closed 2-manifold."""
    grid = _sphere_grid(res=32)
    cell_flat, vals, count = extract_active_cells(jnp.asarray(grid), 0.0, 100000)
    ex = MarchingTetrahedraExtractor()
    out = ex.from_actives(cell_flat, vals, int(count), grid.shape[0], 0.0, 1.01)
    f = out.mesh_f
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), np.unique(counts)
