"""Profile the paint pipeline's host stages on a NOISE mesh — the
single-pass bench pathology (random weights → noise SDF → capped surface →
40k-face mesh with thousands of components). The r4 driver run measured
paint+glb = 55.2 s on this mesh vs 4.9 s on the sphere fixture; the diffusion
cost is mesh-independent, so the gap is host geometry (UV / render / bake).
This script reproduces it on CPU (host stages run on this same machine in
the real bench — the TPU is remote) with a tiny UNet and production
render/texture sizes, and prints the per-scope split.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/profile_noise_paint.py
"""
import os
import sys
import time

os.environ.setdefault("HY3DGEN_DEBUG", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.geometry.postprocess import (
    DegenerateFaceRemover,
    FaceReducer,
    FloaterRemover,
)
from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline
from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS
from hunyuan3d2_tpu.volume.decoders import (
    bucket_slice,
    quads_to_tris,
    surface_nets_from_grid,
)


def noise_mesh(res=96, cap=60000, seed=0):
    """Capped surface-nets mesh of a pure-noise SDF: same topology class as
    the bench single-pass mesh (holey, thousands of tiny components)."""
    rs = np.random.RandomState(seed)
    g = rs.randn(res + 1, res + 1, res + 1).astype(np.float16)
    # light smoothing so cells aren't 100% active (mirrors a decoded SDF)
    gf = g.astype(np.float32)
    for ax in range(3):
        gf = (np.roll(gf, 1, ax) + gf + np.roll(gf, -1, ax)) / 3.0
    verts, quads, nq, count, ok = jax.jit(
        lambda x: surface_nets_from_grid(x, 0.0, 1.01, cap, (3 * cap) // 2)
    )(jnp.asarray(gf, jnp.float16))
    nq, count = int(nq), int(count)
    nq = min(nq, (3 * cap) // 2)
    count = min(count, cap)
    v = bucket_slice(verts, count).astype(np.float32)
    f = quads_to_tris(bucket_slice(quads, nq)).astype(np.int32)
    print(f"noise mesh: {count} verts {len(f)} tris (ok={bool(ok)})")
    return Mesh(v, f)


def main():
    t0 = time.perf_counter()
    m = noise_mesh()
    print(f"mesh build: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    m = FloaterRemover()(m)
    m = DegenerateFaceRemover()(m)
    m = FaceReducer()(m, max_facenum=40000)
    print(f"postprocess: {time.perf_counter() - t0:.1f}s "
          f"({len(m.faces)} faces, {len(m.vertices)} verts)")

    paint = Hunyuan3DPaintPipeline.init_random(
        jax.random.PRNGKey(1), size="tiny", view_size=512,
        render_size=2048, texture_size=2048, num_inference_steps=2)
    rs = np.random.RandomState(0)
    img = np.zeros((512, 512, 4), np.uint8)
    img[128:384, 128:384, :3] = rs.randint(0, 255, (256, 256, 3))
    img[128:384, 128:384, 3] = 255
    image = Image.fromarray(img)

    LAST_TIMINGS.clear()
    t0 = time.perf_counter()
    tex = paint(m, image)
    total = time.perf_counter() - t0
    print(f"\npaint total: {total:.2f}s")
    for k, v in sorted(LAST_TIMINGS.items(), key=lambda kv: -kv[1]):
        print(f"  {k:40s} {v:7.2f}s")
    t0 = time.perf_counter()
    tex.export("/tmp/noise_paint.glb")
    print(f"glb export: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
