"""Mesh postprocessors.

Behavioral parity: reference hy3dgen/shapegen/postprocessors.py —
FaceReducer :118 (pymeshlab quadric-edge-collapse to a face budget),
FloaterRemover :131 (small disconnected component removal),
DegenerateFaceRemover :143 (zero-area/duplicate face cleanup),
MeshSimplifier :179 (external mesh_simplifier.bin), mesh_normalize :160.

This environment has no pymeshlab; all operators run on our native C++
library (hunyuan3d2_tpu/native) or pure numpy — in-process, no temp-file
round-trips (the reference shells through .ply files and os.system).
Every operator accepts and returns a geometry.Mesh (or anything with
vertices/faces) and preserves extra attributes where meaningful.
"""

from __future__ import annotations

import numpy as np

from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.utils.timer import synchronize_timer


def _as_mesh(mesh) -> Mesh:
    if isinstance(mesh, Mesh):
        return mesh
    return Mesh(np.asarray(mesh.vertices, np.float32),
                np.asarray(mesh.faces, np.int32))


class FloaterRemover:
    """Drop connected components with < threshold × max-component faces
    (parity: postprocessors.py:131 — pymeshlab small-component filter)."""

    def __init__(self, threshold: float = 0.005):
        self.threshold = threshold

    @synchronize_timer("FloaterRemover")
    def __call__(self, mesh, threshold: float = None) -> Mesh:
        from hunyuan3d2_tpu import native

        mesh = _as_mesh(mesh).copy()
        if len(mesh.faces) == 0:
            return mesh
        labels, n = native.face_components(mesh.faces, len(mesh.vertices))
        if n <= 1:
            return mesh
        counts = np.bincount(labels, minlength=n)
        keep_components = counts >= max(1, int(counts.max() * (threshold or self.threshold)))
        mesh.faces = mesh.faces[keep_components[labels]]
        return mesh.remove_unreferenced_vertices()


class DegenerateFaceRemover:
    """Remove zero-area and duplicate faces; weld exactly-coincident vertices
    (parity: postprocessors.py:143 — the pymeshlab reload cleanup)."""

    @synchronize_timer("DegenerateFaceRemover")
    def __call__(self, mesh) -> Mesh:
        mesh = _as_mesh(mesh).copy()
        v = np.asarray(mesh.vertices, np.float32)
        f = np.asarray(mesh.faces, np.int32)
        try:
            from hunyuan3d2_tpu import native

            # one O(N) hashing pass (the numpy twin below lexsorts two
            # ~500k-row arrays and dominated the postprocess stage)
            out_v, out_f = native.weld_dedup(v, f)
            mesh.vertices, mesh.faces = out_v, out_f
            return mesh.remove_unreferenced_vertices()
        except Exception:  # pragma: no cover — numpy fallback
            pass
        # weld identical vertices
        uniq, inv = np.unique(v, axis=0, return_inverse=True)
        f = inv[f].astype(np.int32)
        # drop faces with repeated indices
        ok = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        f = f[ok]
        # drop zero-area faces
        e1 = uniq[f[:, 1]] - uniq[f[:, 0]]
        e2 = uniq[f[:, 2]] - uniq[f[:, 0]]
        area2 = np.linalg.norm(np.cross(e1, e2), axis=1)
        f = f[area2 > 1e-12]
        # drop duplicate faces (same vertex set)
        key = np.sort(f, axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        f = f[np.sort(first)]
        mesh.vertices, mesh.faces = uniq.astype(np.float32), f
        return mesh.remove_unreferenced_vertices()


class FaceReducer:
    """Quadric edge-collapse decimation to max_facenum
    (parity: postprocessors.py:118)."""

    @synchronize_timer("FaceReducer")
    def __call__(self, mesh, max_facenum: int = 40000) -> Mesh:
        import os

        mesh = _as_mesh(mesh)
        if len(mesh.faces) <= max_facenum:
            return mesh
        from hunyuan3d2_tpu import native

        v, f = mesh.vertices, mesh.faces
        # for very large inputs, an O(N) vertex-cluster pre-pass removes the
        # trivial early collapses the exact quadric stage would spend most of
        # its time on; the final shape is still quadric-optimized. Opt out
        # with HY3D_EXACT_SIMPLIFY=1 for pure quadric end to end.
        if (len(f) > 8 * max_facenum
                and os.environ.get("HY3D_EXACT_SIMPLIFY", "0") != "1"):
            # 2× (not 4×): QEM cost is ~linear in collapse count, so the
            # pre-pass should absorb as much of the reduction as quality
            # allows — at 385³ surface-nets density, clustering to 2×target
            # then quadric-halving measures 0.45 s vs 1.97 s at 4×target
            # with the same sphere-fidelity stats (test_postprocess.py)
            target_pre = 2 * max_facenum
            e1 = v[f[:, 1]] - v[f[:, 0]]
            e2 = v[f[:, 2]] - v[f[:, 0]]
            area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
            cell = float(np.sqrt(max(area, 1e-12) / max(target_pre / 2, 1)))
            for _ in range(3):
                cv, cf = native.cluster_decimate(v, f, cell)
                if len(cf) <= max_facenum:
                    cell *= 0.7  # overshot: refine
                    continue
                if len(cf) > 2 * target_pre:
                    cell *= float(np.sqrt(len(cf) / target_pre))
                    continue
                v, f = cv, cf
                break
        if len(f) > max_facenum:
            v, f = native.simplify(v, f, max_facenum)
        return Mesh(v, f, metadata=dict(mesh.metadata))


class MeshSimplifier:
    """In-process replacement for the reference's external
    ``mesh_simplifier.bin`` (postprocessors.py:179-202): same quadric
    decimation engine, ratio-based budget."""

    def __init__(self, executable: str = None):
        # executable kept for API parity; ignored (no external binary needed)
        self.executable = executable

    @synchronize_timer("MeshSimplifier")
    def __call__(self, mesh, ratio: float = 0.1) -> Mesh:
        mesh = _as_mesh(mesh)
        target = max(4, int(len(mesh.faces) * ratio))
        from hunyuan3d2_tpu import native

        v, f = native.simplify(mesh.vertices, mesh.faces, target)
        return Mesh(v, f, metadata=dict(mesh.metadata))


def mesh_normalize(mesh) -> Mesh:
    """Scale into [-0.99, 0.99] cube around the centroid of the bbox
    (parity: postprocessors.py:160)."""
    mesh = _as_mesh(mesh)
    vmin, vmax = mesh.vertices.min(0), mesh.vertices.max(0)
    center = (vmin + vmax) / 2
    scale = (vmax - vmin).max()
    mesh.vertices = (mesh.vertices - center) / max(scale, 1e-12) * 2.0 * 0.99
    return mesh
