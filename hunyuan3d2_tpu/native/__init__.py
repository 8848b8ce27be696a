"""ctypes bindings for the native CPU runtime (libhy3dnative.so).

Builds on first import if the shared library is missing (g++ is baked into
the image; no pybind11, so the C ABI + ctypes is the binding layer).
Public functions return numpy arrays and never expose raw pointers.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libhy3dnative.so")
_lib = None


def _build():
    subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            os.path.join(_DIR, "hy3dnative.cpp")):
        _build()
    lib = ctypes.CDLL(_SO)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = ctypes.POINTER(ctypes.c_int64)

    lib.hy3d_rasterize.argtypes = [f32p, ctypes.c_int64, i32p, ctypes.c_int64,
                                   ctypes.c_int, ctypes.c_int, i32p, f32p, f32p]
    lib.hy3d_rasterize_interp.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, f32p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, i32p, f32p, f32p, f32p]
    lib.hy3d_vertex_inpaint.argtypes = [
        f32p, u8p, f32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, i32p, i32p, ctypes.c_int64]
    lib.hy3d_grid_put_linear.argtypes = [f32p, f32p, ctypes.c_int64,
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, f32p]
    lib.hy3d_bake_view.argtypes = [
        f32p, i32p, f32p, u8p, ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, f32p, f32p]
    lib.hy3d_bake_view.restype = ctypes.c_int
    lib.hy3d_bake_view_u8.argtypes = [
        f32p, i32p, u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, f32p, f32p]
    lib.hy3d_bake_view_u8.restype = ctypes.c_int
    lib.hy3d_pushpull_fill.argtypes = [f32p, u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int]
    lib.hy3d_face_components.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.hy3d_face_components.restype = ctypes.c_int32
    lib.hy3d_simplify.argtypes = [f32p, ctypes.c_int64, i32p, ctypes.c_int64,
                                  ctypes.c_int64, f32p, i64p, i32p, i64p]
    lib.hy3d_weld_dedup.argtypes = [f32p, ctypes.c_int64, i32p, ctypes.c_int64,
                                    f32p, i64p, i32p, i64p]
    lib.hy3d_cluster_decimate.argtypes = [f32p, ctypes.c_int64, i32p,
                                          ctypes.c_int64, ctypes.c_double,
                                          f32p, i64p, i32p, i64p]
    lib.hy3d_surface_nets.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                      f32p, ctypes.c_int64, i32p, ctypes.c_int64,
                                      i64p, i64p]
    lib.hy3d_surface_nets.restype = ctypes.c_int32
    lib.hy3d_sn_actives.argtypes = [i32p, f32p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_float, f32p,
                                    i32p, ctypes.c_int64, i64p]
    lib.hy3d_sn_actives.restype = ctypes.c_int32
    _lib = lib
    return lib


def rasterize(verts_clip: np.ndarray, faces: np.ndarray, height: int, width: int):
    """verts_clip [N,4] float32 clip-space, faces [M,3] int32 →
    (face_id [H,W] int32 with -1 empty, bary [H,W,3] f32, depth [H,W] f32).
    Deterministic z-resolve (nearest depth, ties → lowest face id), matching
    the reference's packed-token contract (SURVEY.md §5 race detection)."""
    lib = get_lib()
    verts_clip = np.ascontiguousarray(verts_clip, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    face_id = np.empty((height, width), np.int32)
    bary = np.empty((height, width, 3), np.float32)
    depth = np.empty((height, width), np.float32)
    lib.hy3d_rasterize(verts_clip, len(verts_clip), faces, len(faces),
                       height, width, face_id, bary, depth)
    return face_id, bary, depth


def rasterize_interp(verts_clip: np.ndarray, faces: np.ndarray,
                     attrs: np.ndarray, height: int, width: int, bufs=None):
    """Fused rasterization + per-vertex attribute interpolation.
    attrs [N,C] → (face_id, bary, depth, attr_map [H,W,C]).

    ``bufs``: optional dict used as a buffer cache — first-touch page faults
    on this host are ~100 MB/s, so re-allocating the ~180 MB of 2048² output
    maps per view dominates the bake; callers on a hot loop pass a persistent
    dict and must consume the outputs before the next call with the same
    dict."""
    lib = get_lib()
    verts_clip = np.ascontiguousarray(verts_clip, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    attrs = np.ascontiguousarray(attrs, np.float32)
    c = attrs.shape[1]
    face_id = _buf(bufs, "ri_fid", (height, width), np.int32)
    bary = _buf(bufs, "ri_bary", (height, width, 3), np.float32)
    depth = _buf(bufs, "ri_depth", (height, width), np.float32)
    out = _buf(bufs, "ri_amap", (height, width, c), np.float32)
    lib.hy3d_rasterize_interp(verts_clip, len(verts_clip), faces, len(faces),
                              attrs, c, height, width, face_id, bary, depth, out)
    return face_id, bary, depth, out


def _buf(bufs, name, shape, dtype):
    if bufs is None:
        return np.empty(shape, dtype)
    a = bufs.get(name)
    if a is None or a.shape != shape or a.dtype != dtype:
        a = np.empty(shape, dtype)
        bufs[name] = a
    return a


def grid_put_linear(coords: np.ndarray, values: np.ndarray, h: int, w: int,
                    out: np.ndarray = None):
    """Bilinear scatter splat → [h,w,C] normalized grid. ``out``: optional
    preallocated [h,w,C] fp32 target (reused-buffer hot path)."""
    lib = get_lib()
    coords = np.ascontiguousarray(coords, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    c = values.shape[1]
    if out is None:
        out = np.empty((h, w, c), np.float32)
    else:
        assert out.shape == (h, w, c) and out.dtype == np.float32 \
            and out.flags.c_contiguous
    lib.hy3d_grid_put_linear(coords, values, len(coords), h, w, c, out)
    return out


def bake_view(amap: np.ndarray, fid: np.ndarray, image: np.ndarray,
              reliable: np.ndarray, cos_thres: float, weight: float,
              exp: float, tex_merge: np.ndarray, trust: np.ndarray) -> bool:
    """Fused mask+splat+merge of one view into the running texture
    (numerically identical to back_project → fast_bake_texture).
    tex_merge [th,tw,C] and trust [th,tw] are accumulated in place.
    Returns False when the view was skipped (>99 % already painted)."""
    lib = get_lib()
    h, w, c = image.shape
    th, tw = trust.shape
    assert amap.shape == (h, w, 6) and fid.shape == (h, w)
    assert tex_merge.shape == (th, tw, c)
    merged = lib.hy3d_bake_view(
        np.ascontiguousarray(amap, np.float32),
        np.ascontiguousarray(fid, np.int32),
        np.ascontiguousarray(image, np.float32),
        np.ascontiguousarray(reliable, np.uint8),
        float(cos_thres), h, w, c, th, tw, float(weight), float(exp),
        tex_merge, trust)
    return bool(merged)


def bake_view_u8(amap: np.ndarray, fid: np.ndarray, image_u8: np.ndarray,
                 reliable: np.ndarray, cos_thres: float, weight: float,
                 exp: float, tex_merge: np.ndarray, trust: np.ndarray) -> bool:
    """bake_view with the view image at its NATIVE uint8 resolution
    [ih,iw,C]: the kernel bilinearly samples it at each raster pixel
    (align_corners=False, i.e. a PIL-BILINEAR-style upsample) instead of
    requiring a pre-upsampled fp32 image — no 50 MB/view temporaries."""
    lib = get_lib()
    h, w = fid.shape
    ih, iw, c = image_u8.shape
    th, tw = trust.shape
    if c > 8:
        raise ValueError(f"bake_view_u8: at most 8 channels, got {c}")
    assert amap.shape == (h, w, 6) and tex_merge.shape == (th, tw, c)
    merged = lib.hy3d_bake_view_u8(
        np.ascontiguousarray(amap, np.float32),
        np.ascontiguousarray(fid, np.int32),
        np.ascontiguousarray(image_u8, np.uint8), ih, iw,
        np.ascontiguousarray(reliable, np.uint8),
        float(cos_thres), h, w, c, th, tw, float(weight), float(exp),
        tex_merge, trust)
    if merged < 0:
        raise ValueError(f"bake_view_u8: kernel rejected c={c} channels")
    return bool(merged)


def pushpull_fill(texture: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """O(N) pyramid hole fill for texture atlases: known texels (mask=255)
    are kept bit-exact; unknowns take valid-weighted coarse averages."""
    lib = get_lib()
    texture = np.ascontiguousarray(texture, np.float32)
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w, c = texture.shape
    lib.hy3d_pushpull_fill(texture, mask, h, w, c)
    return texture


def vertex_inpaint(texture: np.ndarray, mask: np.ndarray, vtx_pos: np.ndarray,
                   vtx_uv: np.ndarray, pos_idx: np.ndarray, uv_idx: np.ndarray):
    """Propagate painted vertex colors along the mesh graph into unpainted
    texels (parity: meshVerticeInpaint, texgen mesh_processor)."""
    lib = get_lib()
    texture = np.ascontiguousarray(texture, np.float32)
    mask = np.ascontiguousarray(mask, np.uint8)
    th, tw, tc = texture.shape
    out_tex = np.empty_like(texture)
    out_mask = np.empty_like(mask)
    lib.hy3d_vertex_inpaint(
        texture, mask, out_tex, out_mask, th, tw, tc,
        np.ascontiguousarray(vtx_pos, np.float32), len(vtx_pos),
        np.ascontiguousarray(vtx_uv, np.float32), len(vtx_uv),
        np.ascontiguousarray(pos_idx, np.int32),
        np.ascontiguousarray(uv_idx, np.int32), len(pos_idx))
    return out_tex, out_mask


def face_components(faces: np.ndarray, num_vertices: int):
    """Label connected components of the face graph. → (labels [M], count)."""
    lib = get_lib()
    faces = np.ascontiguousarray(faces, np.int32)
    labels = np.empty(len(faces), np.int32)
    n = lib.hy3d_face_components(faces, len(faces), num_vertices, labels)
    return labels, int(n)


def surface_nets(grid: np.ndarray, level: float = 0.0):
    """Dense surface nets over [R,R,R] f32 grid → (verts lattice coords,
    faces). OpenMP-parallel, deterministic output ordering."""
    lib = get_lib()
    grid = np.ascontiguousarray(grid, np.float32)
    R = grid.shape[0]
    # generous caps: active cells bounded by total surface-adjacent cells
    verts_cap = max(1 << 20, int(R * R * 24))
    faces_cap = verts_cap * 4
    out_v = np.empty((verts_cap, 3), np.float32)
    out_f = np.empty((faces_cap, 3), np.int32)
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    ret = lib.hy3d_surface_nets(grid.reshape(-1), R, level, out_v, verts_cap,
                                out_f, faces_cap, ctypes.byref(nv),
                                ctypes.byref(nf))
    if ret != 0:
        raise MemoryError(f"surface_nets capacity exceeded (code {ret})")
    return out_v[: nv.value].copy(), out_f[: nf.value].copy()


def sn_from_actives(cells: np.ndarray, vals: np.ndarray, nc: int,
                    level: float = 0.0):
    """Surface nets from compacted active cells (sorted by flat id):
    cells [K,3] int32, vals [K,8] f32 → (verts [K,3] lattice coords,
    faces [F,3]). Single native pass — the numpy twin materializes ~200 MB
    of [K,12,3] intermediates, which dominates at this host's first-touch
    page-fault rate."""
    lib = get_lib()
    cells = np.ascontiguousarray(cells, np.int32)
    vals = np.ascontiguousarray(vals, np.float32)
    k = len(cells)
    out_v = np.empty((k, 3), np.float32)
    faces_cap = 6 * max(k, 1)
    out_f = np.empty((faces_cap, 3), np.int32)
    nf = ctypes.c_int64()
    ret = lib.hy3d_sn_actives(cells.reshape(-1), vals.reshape(-1), k, nc,
                              level, out_v.reshape(-1), out_f.reshape(-1),
                              faces_cap, ctypes.byref(nf))
    if ret != 0:
        raise MemoryError(f"sn_from_actives capacity exceeded (code {ret})")
    return out_v, out_f[: nf.value].copy()


def simplify(verts: np.ndarray, faces: np.ndarray, target_faces: int):
    """Quadric edge-collapse decimation to ≈target_faces."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out_v = np.empty_like(verts)
    out_f = np.empty_like(faces)
    onv = ctypes.c_int64()
    onf = ctypes.c_int64()
    lib.hy3d_simplify(verts, len(verts), faces, len(faces), target_faces,
                      out_v, ctypes.byref(onv), out_f, ctypes.byref(onf))
    return out_v[: onv.value].copy(), out_f[: onf.value].copy()


def weld_dedup(verts: np.ndarray, faces: np.ndarray):
    """Exact vertex weld + degenerate/duplicate face removal in one hashing
    pass (O(N); the numpy twin lexsorts twice). Keeps first-occurrence
    ordering for both vertices and faces."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out_v = np.empty_like(verts)
    out_f = np.empty_like(faces)
    onv = ctypes.c_int64()
    onf = ctypes.c_int64()
    lib.hy3d_weld_dedup(verts, len(verts), faces, len(faces),
                        out_v, ctypes.byref(onv), out_f, ctypes.byref(onf))
    return out_v[: onv.value].copy(), out_f[: onf.value].copy()


def cluster_decimate(verts: np.ndarray, faces: np.ndarray, cell: float):
    """Uniform vertex clustering at `cell` size: averages each cluster and
    drops collapsed/duplicate faces. O(N) pre-decimation for huge meshes."""
    lib = get_lib()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out_v = np.empty_like(verts)
    out_f = np.empty_like(faces)
    onv = ctypes.c_int64()
    onf = ctypes.c_int64()
    lib.hy3d_cluster_decimate(verts, len(verts), faces, len(faces),
                              float(cell), out_v, ctypes.byref(onv),
                              out_f, ctypes.byref(onf))
    return out_v[: onv.value].copy(), out_f[: onf.value].copy()
