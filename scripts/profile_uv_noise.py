"""Profile mesh_uv_wrap on a REALISTIC bench-pathology mesh: capped
surface-nets of a smoothed noise SDF, face-reduced to 40k — the exact
single-pass paint input (vs profile_uv_components' disjoint-tet synthetic).

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/profile_uv_noise.py
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
from hunyuan3d2_tpu.geometry.postprocess import (
    DegenerateFaceRemover,
    FaceReducer,
    FloaterRemover,
)
from hunyuan3d2_tpu.geometry.uv import mesh_uv_wrap


def noise_mesh(res=96, cap=60000, seed=0):
    import jax
    import jax.numpy as jnp

    from hunyuan3d2_tpu.volume.decoders import (
        bucket_slice,
        quads_to_tris,
        surface_nets_from_grid,
    )

    rs = np.random.RandomState(seed)
    g = rs.randn(res + 1, res + 1, res + 1).astype(np.float32)
    for ax in range(3):
        g = (np.roll(g, 1, ax) + g + np.roll(g, -1, ax)) / 3.0
    verts, quads, nq, count, ok = jax.jit(
        lambda x: surface_nets_from_grid(x, 0.0, 1.01, cap, (3 * cap) // 2)
    )(jnp.asarray(g, jnp.float16))
    nq = min(int(nq), (3 * cap) // 2)
    count = min(int(count), cap)
    v = bucket_slice(verts, count).astype(np.float32)
    f = quads_to_tris(bucket_slice(quads, nq)).astype(np.int32)
    return Mesh(v, f)


def main():
    t0 = time.perf_counter()
    m = noise_mesh()
    print(f"mesh: {len(m.vertices)}v {len(m.faces)}f "
          f"({time.perf_counter() - t0:.1f}s to build)")
    m = FloaterRemover()(m)
    m = DegenerateFaceRemover()(m)
    m = FaceReducer()(m, max_facenum=40000)
    print(f"postprocessed: {len(m.vertices)}v {len(m.faces)}f")

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    out = mesh_uv_wrap(m)
    pr.disable()
    print(f"mesh_uv_wrap: {time.perf_counter() - t0:.2f}s "
          f"-> {len(out.vertices)}v")
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(16)
    print(s.getvalue())


if __name__ == "__main__":
    main()
