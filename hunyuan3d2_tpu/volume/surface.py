"""SDF grid → triangle mesh surface extraction (from scratch, vectorized).

Behavioral parity: reference hy3dgen/shapegen/models/autoencoders/
surface_extractors.py (SurfaceExtractor :38, MCSurfaceExtractor :67 —
skimage marching-cubes + bbox rescale :75; DMCSurfaceExtractor :79 — CUDA
differentiable MC; registry dict :97; per-batch try/except degrading to
None :52-63). This environment ships neither skimage nor diso, so the
framework provides its own extractors:

  * ``MarchingCubesExtractor`` ('mc') — classic case-table marching cubes
    with a GENERATED 256-entry table (volume/mc_table.py): vertices only on
    cube edges, welded by exact lattice-edge key, MC-scale face counts
    matching the reference's skimage path.
  * ``MarchingTetrahedraExtractor`` ('mt') — the cube is split into the 6
    Kuhn tetrahedra around the main diagonal (a face-to-face tiling of
    space ⇒ crack-free, watertight output); per-tet case logic is table-free
    (1-in / 2-2 / 3-in) and fully vectorized over active cells; vertices are
    welded by exact lattice-edge key. Topologically equivalent to marching
    cubes (same isosurface, ~2× triangles).
  * ``SurfaceNetsExtractor`` ('dmc') — naive surface nets: one vertex per
    active cell (mean of cube-edge crossings), a quad per sign-changing grid
    edge. A *dual* method like the reference's DMC, with ~4× fewer faces and
    smoother geometry.

Both run on host numpy over active cells only (1-2 % of the grid at 384³).
Output vertices are rescaled to the [-box_v, box_v]³ bbox and faces oriented
outward (occupancy logits: inside > level), matching the reference's
export_to_trimesh winding (pipelines.py:95-110).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.utils.logger import get_logger

logger = get_logger("hunyuan3d2_tpu.surface")


class Latent2MeshOutput:
    """Parity: surface_extractors.py:22 — simple (verts, faces) record."""

    def __init__(self, mesh_v=None, mesh_f=None):
        self.mesh_v = mesh_v
        self.mesh_f = mesh_f

    def to_mesh(self) -> Mesh:
        return Mesh(self.mesh_v, self.mesh_f)


def center_vertices(vertices: np.ndarray) -> np.ndarray:
    """Translate vertices so the bbox is centered at the origin
    (parity: surface_extractors.py:29)."""
    vmin, vmax = vertices.min(0), vertices.max(0)
    return vertices - (vmin + vmax) / 2.0


# --------------------------------------------------------------------------
# shared helpers
# --------------------------------------------------------------------------
# cube corner offsets, index = standard MC numbering with main diagonal 0→6
_CORNERS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], dtype=np.int64)

# Kuhn decomposition: 6 tets sharing the 0-6 diagonal; face-to-face tiling.
_TETS = np.array(
    [[0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
     [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]], dtype=np.int64)

# tet edges as corner-pair indices into the 4 tet corners
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]],
                      dtype=np.int64)


def _build_tet_case_table():
    """For each of 16 sign configurations: up to 2 triangles as indices into
    the tet's 6 edges (-1 padded), plus the inside/outside corner sets used to
    orient the triangles outward."""
    def edge_id(i, j):
        for e, (a, b) in enumerate(_TET_EDGES):
            if {a, b} == {i, j}:
                return e
        raise AssertionError

    tri_table = -np.ones((16, 2, 3), dtype=np.int64)
    ntri = np.zeros(16, dtype=np.int64)
    for case in range(16):
        inside = [i for i in range(4) if (case >> i) & 1]
        outside = [i for i in range(4) if not (case >> i) & 1]
        if len(inside) == 1:
            i = inside[0]
            tri_table[case, 0] = [edge_id(i, o) for o in outside]
            ntri[case] = 1
        elif len(inside) == 3:
            o = outside[0]
            tri_table[case, 0] = [edge_id(i, o) for i in inside]
            ntri[case] = 1
        elif len(inside) == 2:
            i1, i2 = inside
            o1, o2 = outside
            quad = [edge_id(i1, o1), edge_id(i1, o2), edge_id(i2, o2), edge_id(i2, o1)]
            tri_table[case, 0] = [quad[0], quad[1], quad[2]]
            tri_table[case, 1] = [quad[0], quad[2], quad[3]]
            ntri[case] = 2
    return tri_table, ntri


_TRI_TABLE, _NTRI = _build_tet_case_table()


def _active_cells(grid: np.ndarray, level: float):
    """Indices [K,3] of cells whose 2×2×2 corners straddle the level."""
    occ = grid > level
    agree = np.ones(tuple(s - 1 for s in grid.shape), dtype=bool)
    base = occ[:-1, :-1, :-1]
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                if dx == dy == dz == 0:
                    continue
                nx, ny, nz = grid.shape
                agree &= occ[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz] == base
    return np.argwhere(~agree)


def _marching_tetrahedra(grid: np.ndarray, level: float):
    """grid: [R,R,R] float32 → (verts [V,3] in lattice coords, faces [F,3])."""
    R = grid.shape[0]
    cells = _active_cells(grid, level)              # [K, 3]
    if len(cells) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    corner_idx = cells[:, None, :] + _CORNERS[None]
    flat = (corner_idx[..., 0] * R + corner_idx[..., 1]) * R + corner_idx[..., 2]
    return _mt_from_actives(cells, grid.reshape(-1)[flat], R, level)


def _mt_from_actives(cells: np.ndarray, vals_in: np.ndarray, R: int, level: float):
    """Marching tetrahedra from compacted active cells (cells [K,3],
    vals [K,8] — fully cell-local, see _sn_from_actives)."""
    if len(cells) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    corner_idx = cells[:, None, :].astype(np.int64) + _CORNERS[None]  # [K,8,3]
    flat = (corner_idx[..., 0] * R + corner_idx[..., 1]) * R + corner_idx[..., 2]
    vals = vals_in.astype(np.float32)                          # [K, 8]
    corner_f = corner_idx.astype(np.float32)

    all_tri_verts = []     # list of [T, 3, 3] float
    all_tri_keys = []      # list of [T, 3] int64 (welding keys)
    for tet in _TETS:
        tv = vals[:, tet]                                      # [K, 4]
        tg = flat[:, tet]                                      # [K, 4] lattice ids
        tc = corner_f[:, tet, :]                               # [K, 4, 3]
        inside = tv > level
        case = (inside * (1 << np.arange(4))).sum(1)           # [K]
        sel = (case > 0) & (case < 15)
        if not sel.any():
            continue
        tv, tg, tc, case = tv[sel], tg[sel], tc[sel], case[sel]
        ins = inside[sel]

        # all 6 edge intersections (only the needed ones are referenced)
        a, b = _TET_EDGES[:, 0], _TET_EDGES[:, 1]
        va, vb = tv[:, a], tv[:, b]                            # [S, 6]
        denom = vb - va
        denom = np.where(np.abs(denom) < 1e-12, np.float32(1e-12), denom)
        t = np.clip((level - va) / denom, 0.0, 1.0).astype(np.float32)  # [S, 6]
        pa, pb = tc[:, a, :], tc[:, b, :]                      # [S, 6, 3]
        epts = pa + t[..., None] * (pb - pa)                   # [S, 6, 3]
        # weld key: canonical (min,max) lattice-point pair of the edge
        ga, gb = tg[:, a], tg[:, b]
        lo, hi = np.minimum(ga, gb), np.maximum(ga, gb)
        ekey = lo.astype(np.int64) * (R ** 3) + hi              # [S, 6]

        # outward reference direction: mean(inside pts) - mean(outside pts)
        w_in = ins.astype(np.float32)
        n_in = w_in.sum(1, keepdims=True)
        cen_in = (tc * w_in[..., None]).sum(1) / n_in
        cen_out = (tc * (1 - w_in)[..., None]).sum(1) / (4 - n_in)
        out_dir = cen_out - cen_in                             # [S, 3]

        tris = _TRI_TABLE[case]                                # [S, 2, 3]
        nt = _NTRI[case]                                       # [S]
        for ti in range(2):
            m = nt > ti
            if not m.any():
                continue
            e3 = tris[m, ti]                                   # [Q, 3]
            rows = np.arange(len(e3))
            p = epts[m][rows[:, None], e3]                     # [Q, 3, 3]
            k3 = ekey[m][rows[:, None], e3]                    # [Q, 3]
            # orient: normal should point outward (inside→outside)
            n = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
            flip = (n * out_dir[m]).sum(1) < 0
            p[flip] = p[flip][:, [0, 2, 1]]
            k3[flip] = k3[flip][:, [0, 2, 1]]
            # drop degenerate (repeated edge) triangles
            ok = (k3[:, 0] != k3[:, 1]) & (k3[:, 1] != k3[:, 2]) & (k3[:, 0] != k3[:, 2])
            all_tri_verts.append(p[ok])
            all_tri_keys.append(k3[ok])

    if not all_tri_verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    P = np.concatenate(all_tri_verts)                          # [F, 3, 3]
    K3 = np.concatenate(all_tri_keys)                          # [F, 3]
    keys, first, inv = np.unique(K3.reshape(-1), return_index=True,
                                 return_inverse=True)
    verts = P.reshape(-1, 3)[first].astype(np.float32)
    faces = inv.reshape(-1, 3).astype(np.int32)
    return verts, faces


def _mc_from_actives(cells: np.ndarray, vals_in: np.ndarray, R: int, level: float):
    """Classic marching cubes from compacted active cells (cells [K,3],
    vals [K,8]): case-table lookup (volume/mc_table.py — generated, not
    transcribed), vertices only on cube edges, welded by global lattice-edge
    key. Parity: the reference's skimage path (surface_extractors.py:69-76)
    — same vertex placement rule and MC-scale face counts; connectivity on
    ambiguous faces follows the fixed Kuhn face diagonal instead of
    skimage's asymptotic decider (both are globally consistent/watertight).
    """
    from hunyuan3d2_tpu.volume.mc_table import (
        CORNERS as _MC_CORNERS,
        CUBE_EDGES as _MC_EDGES,
        NTRI,
        TRI_TABLE,
    )

    if len(cells) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    cells = cells.astype(np.int64)
    vals = vals_in.astype(np.float32)                       # [K, 8]
    corner_idx = cells[:, None, :] + _MC_CORNERS[None]      # [K, 8, 3]
    flat = (corner_idx[..., 0] * R + corner_idx[..., 1]) * R + corner_idx[..., 2]
    corner_f = corner_idx.astype(np.float32)

    case = ((vals > level) << np.arange(8)).sum(1)          # [K]
    nt = NTRI[case]                                         # [K]
    sel = nt > 0
    if not sel.any():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    vals, flat, corner_f = vals[sel], flat[sel], corner_f[sel]
    case, nt = case[sel], nt[sel]

    # all 12 cube-edge intersections (only referenced ones used)
    a, b = _MC_EDGES[:, 0], _MC_EDGES[:, 1]
    va, vb = vals[:, a], vals[:, b]                         # [S, 12]
    denom = vb - va
    denom = np.where(np.abs(denom) < 1e-12, np.float32(1e-12), denom)
    t = np.clip((level - va) / denom, 0.0, 1.0).astype(np.float32)
    pa, pb = corner_f[:, a, :], corner_f[:, b, :]
    epts = pa + t[..., None] * (pb - pa)                    # [S, 12, 3]
    ga, gb = flat[:, a], flat[:, b]
    lo, hi = np.minimum(ga, gb), np.maximum(ga, gb)
    ekey = lo.astype(np.int64) * (R ** 3) + hi              # [S, 12]

    tris = TRI_TABLE[case]                                  # [S, W, 3]
    all_p, all_k = [], []
    for s in range(TRI_TABLE.shape[1]):
        m = nt > s
        if not m.any():
            continue
        e3 = tris[m, s]                                     # [Q, 3]
        rows = np.arange(len(e3))[:, None]
        all_p.append(epts[m][rows, e3])                     # [Q, 3, 3]
        all_k.append(ekey[m][rows, e3])                     # [Q, 3]
    P = np.concatenate(all_p)
    K3 = np.concatenate(all_k)
    # drop degenerate triangles (coincident welded vertices)
    ok = (K3[:, 0] != K3[:, 1]) & (K3[:, 1] != K3[:, 2]) & (K3[:, 0] != K3[:, 2])
    P, K3 = P[ok], K3[ok]
    keys, first, inv = np.unique(K3.reshape(-1), return_index=True,
                                 return_inverse=True)
    verts = P.reshape(-1, 3)[first].astype(np.float32)
    faces = inv.reshape(-1, 3).astype(np.int32)
    return verts, faces


def _sn_from_actives(cells: np.ndarray, vals: np.ndarray, R: int, level: float):
    """Surface nets from compacted active cells.

    cells: [K,3] int cell coords SORTED by flat id; vals: [K,8] corner values
    (corner order _CORNERS). Fully local: faces derive from each cell's own
    min-corner lattice edges (an edge with a sign change is contained only in
    active cells), neighbors resolved by searchsorted over the sorted ids.
    This is the host half of the on-device active-cell extraction path
    (ShapeVAE.decode_actives) — no dense grid ever reaches the host.
    """
    if len(cells) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    nc = R - 1
    try:
        # native single pass (identical output; the numpy path below
        # materializes ~200 MB of [K,12,3] intermediates at K=245k)
        from hunyuan3d2_tpu import native

        return native.sn_from_actives(cells, vals, nc, level)
    except Exception:  # pragma: no cover — lib always builds in this image
        pass
    vals = vals.astype(np.float32)
    cells = cells.astype(np.int64)
    cell_flat = (cells[:, 0] * nc + cells[:, 1]) * nc + cells[:, 2]

    def lookup(flat_ids):
        pos = np.searchsorted(cell_flat, flat_ids)
        pos = np.minimum(pos, len(cell_flat) - 1)
        ok = cell_flat[pos] == flat_ids
        return np.where(ok, pos, -1).astype(np.int32)

    corner_f = (cells[:, None, :] + _CORNERS[None]).astype(np.float32)
    cube_edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0],
                           [4, 5], [5, 6], [6, 7], [7, 4],
                           [0, 4], [1, 5], [2, 6], [3, 7]], dtype=np.int64)
    va = vals[:, cube_edges[:, 0]]
    vb = vals[:, cube_edges[:, 1]]
    cross = (va > level) != (vb > level)                       # [K, 12]
    denom = vb - va
    denom = np.where(np.abs(denom) < 1e-12, np.float32(1e-12), denom)
    t = np.clip((level - va) / denom, 0.0, 1.0).astype(np.float32)
    pa = corner_f[:, cube_edges[:, 0]]
    pb = corner_f[:, cube_edges[:, 1]]
    pts = pa + t[..., None] * (pb - pa)                        # [K, 12, 3]
    w = cross.astype(np.float32)
    verts = ((pts * w[..., None]).sum(1)
             / np.maximum(w.sum(1, keepdims=True), 1)).astype(np.float32)

    # faces: each active cell owns its 3 min-corner lattice edges
    # (corner0→1 = +x, corner0→3 = +y, corner0→4 = +z)
    strides = np.array([nc * nc, nc, 1], dtype=np.int64)
    occ0 = vals[:, 0] > level
    end_corner = {0: 1, 1: 3, 2: 4}
    faces = []
    for d in range(3):
        u, v = (d + 1) % 3, (d + 2) % 3
        change = occ0 != (vals[:, end_corner[d]] > level)
        interior = (cells[:, u] > 0) & (cells[:, v] > 0)
        sel = np.flatnonzero(change & interior)
        if len(sel) == 0:
            continue
        base = cell_flat[sel]
        su, sv = strides[u], strides[v]
        quad = np.stack([
            sel.astype(np.int32),
            lookup(base - su),
            lookup(base - su - sv),
            lookup(base - sv),
        ], axis=1)
        valid = (quad >= 0).all(1)
        quad = quad[valid]
        inside_lo = occ0[sel[valid]]
        q = quad
        q[~inside_lo] = quad[~inside_lo][:, ::-1]
        faces.append(q[:, [0, 1, 2]])
        faces.append(q[:, [0, 2, 3]])
    if not faces:
        return verts, np.zeros((0, 3), np.int32)
    return verts, np.concatenate(faces).astype(np.int32)


def _gather_corner_vals(grid: np.ndarray, cells: np.ndarray):
    R = grid.shape[0]
    corner_idx = cells[:, None, :] + _CORNERS[None]
    flat = (corner_idx[..., 0] * R + corner_idx[..., 1]) * R + corner_idx[..., 2]
    return grid.reshape(-1)[flat]


def _surface_nets(grid: np.ndarray, level: float):
    """Naive surface nets dual contouring. grid [R,R,R] → verts, faces."""
    cells = _active_cells(grid, level)
    if len(cells) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return _sn_from_actives(cells, _gather_corner_vals(grid, cells),
                            grid.shape[0], level)


# --------------------------------------------------------------------------
# extractor classes (registry parity: surface_extractors.py:97)
# --------------------------------------------------------------------------
class SurfaceExtractor:
    def _extract(self, grid: np.ndarray, level: float):
        raise NotImplementedError

    def __call__(self, grid_logits, mc_level: float = 0.0, box_v: float = 1.01,
                 **kwargs) -> List[Optional[Latent2MeshOutput]]:
        """grid_logits: [B, R, R, R] (jax array or numpy, f16/f32). Per-mesh
        failures degrade to None (parity: surface_extractors.py:52-63)."""
        grid_logits = np.asarray(grid_logits)
        if grid_logits.dtype not in (np.float16, np.float32):
            grid_logits = grid_logits.astype(np.float32)
        outputs = []
        for i in range(grid_logits.shape[0]):
            try:
                verts, faces = self._extract(grid_logits[i], mc_level)
                # lattice coords → bbox coords (parity: :75 rescale)
                R = grid_logits.shape[1]
                verts = verts / (R - 1.0) * (2.0 * box_v) - box_v
                outputs.append(Latent2MeshOutput(verts.astype(np.float32), faces))
            except Exception as e:  # degrade per mesh, don't kill the batch
                logger.error("surface extraction failed: %s", e)
                outputs.append(None)
        return outputs


def _actives_to_host(cell_flat, vals, count: int, R: int):
    # slice ON DEVICE before the host transfer: only `count` of the static
    # capacity crosses the (slow) device→host link
    if hasattr(cell_flat, "device"):
        cell_flat = cell_flat[:count]
        vals = vals[:count]
    cf = np.asarray(cell_flat)[:count].astype(np.int64)
    v = np.asarray(vals)[:count]
    nc = R - 1
    cells = np.stack([cf // (nc * nc), (cf // nc) % nc, cf % nc], axis=1)
    return cells, v


def _finish(verts, faces, R: int, box_v: float):
    verts = verts / (R - 1.0) * (2.0 * box_v) - box_v
    return Latent2MeshOutput(verts.astype(np.float32), faces)


class MarchingTetrahedraExtractor(SurfaceExtractor):
    def _extract(self, grid, level):
        return _marching_tetrahedra(grid, level)

    def from_actives(self, cell_flat, vals, count: int, R: int,
                     mc_level: float, box_v: float):
        cells, v = _actives_to_host(cell_flat, vals, count, R)
        verts, faces = _mt_from_actives(cells, v, R, mc_level)
        return _finish(verts, faces, R, box_v)


class MarchingCubesExtractor(SurfaceExtractor):
    """Classic case-table marching cubes — the 'mc' algorithm proper
    (reference: skimage lewiner path, surface_extractors.py:67-76): vertices
    only on cube edges, MC-scale face counts (~½ of marching tetrahedra)."""

    def _extract(self, grid, level):
        cells = _active_cells(grid, level)
        if len(cells) == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
        return _mc_from_actives(cells, _gather_corner_vals(grid, cells),
                                grid.shape[0], level)

    def from_actives(self, cell_flat, vals, count: int, R: int,
                     mc_level: float, box_v: float):
        cells, v = _actives_to_host(cell_flat, vals, count, R)
        verts, faces = _mc_from_actives(cells, v, R, mc_level)
        return _finish(verts, faces, R, box_v)


class SurfaceNetsExtractor(SurfaceExtractor):
    """Prefers the native OpenMP kernel (hy3dnative.hy3d_surface_nets);
    falls back to the vectorized numpy implementation."""

    use_native = True

    def _extract(self, grid, level):
        if self.use_native:
            try:
                from hunyuan3d2_tpu import native

                return native.surface_nets(np.ascontiguousarray(grid, np.float32),
                                           float(level))
            except Exception as e:  # pragma: no cover - fallback path
                logger.warning("native surface_nets unavailable (%s); numpy", e)
        return _surface_nets(grid, level)

    def from_actives(self, cell_flat, vals, count: int, R: int,
                     mc_level: float, box_v: float):
        cells, v = _actives_to_host(cell_flat, vals, count, R)
        verts, faces = _sn_from_actives(cells, v, R, mc_level)
        return _finish(verts, faces, R, box_v)


SurfaceExtractors = {
    "mc": MarchingCubesExtractor,
    "mt": MarchingTetrahedraExtractor,
    "dmc": SurfaceNetsExtractor,
    "sn": SurfaceNetsExtractor,
}
