"""UV unwrapping (xatlas replacement, from scratch).

Behavioral parity: reference hy3dgen/texgen/utils/uv_warp_utils.py:19-33
(``mesh_uv_wrap``: xatlas.parametrize → remapped verts/faces + per-vertex
uv, with a face-count guard). This environment has no xatlas, so the
framework ships its own charting parametrizer:

  1. faces are bucketed by dominant normal axis (±x, ±y, ±z);
  2. connected components within a bucket (over shared edges) form charts —
     each chart is near-planar, so its axis projection is a low-distortion
     parametrization;
  3. charts are packed into the unit square by a shelf packer with a binary
     search on global scale, leaving a per-chart margin so bilinear texture
     lookups don't bleed across charts;
  4. vertices shared by multiple charts are split (per-corner attribution),
     exactly what xatlas' vmapping does.

Quality is below xatlas (more seams), but charts are injective and padded,
which is what the paint pipeline's bake/inpaint actually requires.
"""

from __future__ import annotations

import numpy as np

from hunyuan3d2_tpu.geometry.mesh import Mesh

_AXES = np.array([
    [1, 0, 0], [-1, 0, 0],
    [0, 1, 0], [0, -1, 0],
    [0, 0, 1], [0, 0, -1],
], np.float32)

# in-plane basis (u, v) per axis, chosen right-handed w.r.t. the axis so
# projected triangles keep their orientation
_BASES = {
    0: ([0, 1, 0], [0, 0, 1]),
    1: ([0, 0, 1], [0, 1, 0]),
    2: ([0, 0, 1], [1, 0, 0]),
    3: ([1, 0, 0], [0, 0, 1]),
    4: ([1, 0, 0], [0, 1, 0]),
    5: ([0, 1, 0], [1, 0, 0]),
}


def _face_components_in_bucket(faces: np.ndarray, bucket: np.ndarray,
                               n_vertices: int) -> np.ndarray:
    """Union-find over faces; union only across edges whose two faces share
    the same bucket. Returns per-face chart id."""
    nf = len(faces)
    parent = np.arange(nf)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    face_of_edge = np.tile(np.arange(nf), 3)
    key = edges[:, 0].astype(np.int64) * n_vertices + edges[:, 1]
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    face_s = face_of_edge[order]
    same = key_s[1:] == key_s[:-1]
    for i in np.nonzero(same)[0]:
        fa, fb = face_s[i], face_s[i + 1]
        if bucket[fa] == bucket[fb]:
            ra, rb = find(fa), find(fb)
            if ra != rb:
                parent[rb] = ra
    roots = np.array([find(i) for i in range(nf)])
    _, chart = np.unique(roots, return_inverse=True)
    return chart


def _face_adjacency(faces: np.ndarray, n_vertices: int) -> np.ndarray:
    """[F, 3] neighbor face ids over shared edges (-1 where boundary)."""
    nf = len(faces)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    face_of_edge = np.tile(np.arange(nf), 3)
    key = edges[:, 0].astype(np.int64) * n_vertices + edges[:, 1]
    order = np.argsort(key, kind="stable")
    key_s, face_s = key[order], face_of_edge[order]
    nbr = np.full((nf, 3), -1, np.int64)
    cnt = np.zeros(nf, np.int64)
    same = np.nonzero(key_s[1:] == key_s[:-1])[0]
    for i in same:
        fa, fb = face_s[i], face_s[i + 1]
        if cnt[fa] < 3:
            nbr[fa, cnt[fa]] = fb
            cnt[fa] += 1
        if cnt[fb] < 3:
            nbr[fb, cnt[fb]] = fa
            cnt[fb] += 1
    return nbr


def _smooth_buckets(fn: np.ndarray, bucket: np.ndarray, nbr: np.ndarray,
                    iters: int = 4, min_dot: float = 0.25) -> np.ndarray:
    """Majority-filter the per-face bucket assignment over the adjacency
    graph: a face joins the bucket shared by ≥2 of its neighbors when its
    normal still projects positively onto that bucket's axis (keeps the
    axis-projection orientation guarantee). Smooths the jagged boundaries of
    the argmax bucketing — the dominant source of seam length — and absorbs
    single-face slivers."""
    bucket = bucket.copy()
    for _ in range(iters):
        nb = np.where(nbr >= 0, bucket[np.maximum(nbr, 0)], -1)  # [F, 3]
        # majority bucket among neighbors (≥2 agreeing)
        maj = np.full(len(bucket), -1, np.int64)
        for a in range(3):
            for b in range(a + 1, 3):
                agree = (nb[:, a] == nb[:, b]) & (nb[:, a] >= 0)
                maj = np.where(agree & (maj < 0), nb[:, a], maj)
        dots = np.einsum("fc,bc->fb", fn, _AXES)
        ok = (maj >= 0) & (maj != bucket) & \
             (dots[np.arange(len(bucket)), np.maximum(maj, 0)] > min_dot)
        if not ok.any():
            break
        bucket[ok] = maj[ok]
    return bucket


def _shelf_pack(sizes: np.ndarray, margin: float):
    """Pack rectangles (w,h) into the unit square. Returns (offsets [N,2],
    scale) — positions of each rect's lower-left corner after scaling."""

    def try_pack(scale):
        order = np.argsort(-sizes[:, 1])  # tallest first
        x = y = shelf_h = 0.0
        pos = np.zeros((len(sizes), 2))
        for i in order:
            w = sizes[i, 0] * scale + 2 * margin
            h = sizes[i, 1] * scale + 2 * margin
            if w > 1.0 or h > 1.0:
                return None
            if x + w > 1.0:
                y += shelf_h
                x = 0.0
                shelf_h = 0.0
            if y + h > 1.0:
                return None
            pos[i] = (x + margin, y + margin)
            x += w
            shelf_h = max(shelf_h, h)
        return pos

    total = float((sizes[:, 0] * sizes[:, 1]).sum())
    scale = 0.85 / max(np.sqrt(total), 1e-12)
    for _ in range(40):
        pos = try_pack(scale)
        if pos is not None:
            return pos, scale
        scale *= 0.93
    raise RuntimeError("UV packing failed")


def unwrap(vertices: np.ndarray, faces: np.ndarray, margin: float = 0.004):
    """→ (new_vertices, new_faces, uv, vmapping): vertices split per chart."""
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    fn = fn / np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
    bucket = np.argmax(fn @ _AXES.T, axis=1)                # [F]
    nbr = _face_adjacency(f, len(v))
    bucket = _smooth_buckets(fn, bucket, nbr)
    chart = _face_components_in_bucket(f, bucket, len(v))   # [F]
    n_charts = chart.max() + 1

    # split vertices per (vertex, chart)
    corner_v = f.reshape(-1)
    corner_chart = np.repeat(chart, 3)
    pair = corner_v * np.int64(n_charts) + corner_chart
    uniq_pair, new_idx = np.unique(pair, return_inverse=True)
    new_faces = new_idx.reshape(-1, 3).astype(np.int32)
    src_vertex = (uniq_pair // n_charts).astype(np.int64)
    src_chart = (uniq_pair % n_charts).astype(np.int64)
    new_vertices = v[src_vertex]

    # project each new vertex with its chart's basis
    chart_bucket = np.zeros(n_charts, np.int64)
    chart_bucket[chart] = bucket
    uv2 = np.zeros((len(new_vertices), 2), np.float64)
    for b in range(6):
        sel = chart_bucket[src_chart] == b
        if not sel.any():
            continue
        bu, bv = _BASES[b]
        uv2[sel, 0] = new_vertices[sel] @ np.asarray(bu, np.float64)
        uv2[sel, 1] = new_vertices[sel] @ np.asarray(bv, np.float64)

    # normalize per chart, collect sizes
    sizes = np.zeros((n_charts, 2))
    mins = np.zeros((n_charts, 2))
    for c in range(n_charts):
        sel = src_chart == c
        lo = uv2[sel].min(0)
        hi = uv2[sel].max(0)
        mins[c] = lo
        sizes[c] = np.maximum(hi - lo, 1e-9)

    pos, scale = _shelf_pack(sizes, margin)
    uv = (uv2 - mins[src_chart]) * scale + pos[src_chart]
    return (new_vertices.astype(np.float32), new_faces,
            uv.astype(np.float32), src_vertex)


def mesh_uv_wrap(mesh: Mesh, max_faces: int = 500000000) -> Mesh:
    """Parity API (uv_warp_utils.py:19-33): returns a mesh with remapped
    vertices/faces and ``mesh.uv`` set."""
    if isinstance(mesh, (list, tuple)):
        mesh = mesh[0]
    if len(mesh.faces) > max_faces:
        raise ValueError("The mesh has more than 500,000,000 faces, which is not supported.")
    if mesh.uv is not None:
        return mesh
    nv, nf, uv, vmap = unwrap(mesh.vertices, mesh.faces)
    out = Mesh(nv, nf, uv=uv, metadata=dict(mesh.metadata))
    if mesh.vertex_colors is not None:
        out.vertex_colors = mesh.vertex_colors[vmap]
    return out
