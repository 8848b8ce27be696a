"""Micro-benchmark: mesh_uv_wrap on a many-component mesh (the single-pass
bench pathology — a capped noise-SDF mesh face-reduced to 40k faces is
thousands of tiny components). Prints cProfile hotspots.

Run: PYTHONPATH= python scripts/profile_uv_components.py [n_tets]
"""
import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.geometry.uv import mesh_uv_wrap


def many_tets(n=10000, seed=0):
    """n disjoint tetrahedra scattered in the unit box: 4n faces, n
    components — same topology class as a capped noise-SDF mesh."""
    rs = np.random.RandomState(seed)
    centers = rs.uniform(-1, 1, (n, 3)).astype(np.float32)
    base = np.array([[0, 0, 0], [0.02, 0, 0], [0, 0.02, 0], [0, 0, 0.02]],
                    np.float32)
    rots = rs.randn(n, 3, 3).astype(np.float32)
    q, _ = np.linalg.qr(rots)
    verts = (base[None] @ q.transpose(0, 2, 1) + centers[:, None]).reshape(-1, 3)
    tet_f = np.array([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]], np.int64)
    faces = (tet_f[None] + 4 * np.arange(n)[:, None, None]).reshape(-1, 3)
    return Mesh(verts, faces.astype(np.int32))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    m = many_tets(n)
    print(f"mesh: {len(m.vertices)} verts {len(m.faces)} faces "
          f"{n} components")
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    out = mesh_uv_wrap(m)
    pr.disable()
    print(f"mesh_uv_wrap: {time.perf_counter() - t0:.2f}s "
          f"→ {len(out.vertices)} verts")
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue())


if __name__ == "__main__":
    main()
