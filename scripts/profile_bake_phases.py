"""Phase breakdown of the production-resolution device bake on real TPU.

Phase A (prepare_bake_tpu: UV raster + per-view geometry) overlaps the
diffusion in the e2e path; Phase B (bake_tpu_prepared: upsample + gather +
accumulate) plus the u8 download are the only critical-path costs. This
script times each warm, at the reference production config (2048 raster,
2048 texture, 512 views — texgen/pipelines.py:50-52).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    small = "--small" in sys.argv
    render_res = 256 if small else 2048
    tex_res = 256 if small else 2048
    view_res = 128 if small else 512
    up_res = min(render_res, 4 * view_res)
    grid_res = 30 if small else 100

    from hunyuan3d2_tpu.geometry.mesh import Mesh
    from hunyuan3d2_tpu.geometry.render import MeshRender
    from hunyuan3d2_tpu.geometry.render_tpu import (
        bake_tpu_prepared, prepare_bake_tpu, upload_mesh)
    from hunyuan3d2_tpu.geometry.uv import mesh_uv_wrap
    from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor

    lin = np.linspace(-1.01, 1.01, grid_res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = (0.85 - np.sqrt(x * x + y * y + z * z))[None].astype(np.float32)
    out = SurfaceNetsExtractor()(g, mc_level=0.0)[0]
    mesh = mesh_uv_wrap(Mesh(out.mesh_v, out.mesh_f))
    r = MeshRender(default_resolution=render_res, texture_size=tex_res)
    r.load_mesh(mesh)
    dev = upload_mesh(r, need_uv=True)

    views = [(0, 0), (0, 90), (0, 180), (0, 270), (90, 0), (-90, 180)]
    weights = [1, 0.1, 0.5, 0.1, 0.05, 0.05]
    mvs = jnp.asarray(np.stack([r._mvp(e, a)[0] for e, a in views]), jnp.float32)
    mvps = jnp.asarray(np.stack([r._mvp(e, a)[1] for e, a in views]), jnp.float32)
    views_u8 = jnp.asarray(np.random.randint(
        0, 255, (6, view_res, view_res, 3), np.uint8))

    def run_a():
        g = prepare_bake_tpu(dev, mvs, mvps, weights, render_res=render_res,
                             tex_res=tex_res, up_res=up_res, exp=4)
        jax.block_until_ready([t for tup in g for t in tup])
        return g

    t0 = time.perf_counter(); geom = run_a()
    print(f"phase A cold: {time.perf_counter()-t0:.2f}s")
    for _ in range(2):
        t0 = time.perf_counter(); geom = run_a()
        print(f"phase A warm: {time.perf_counter()-t0:.2f}s")

    def run_b():
        tex, trust = bake_tpu_prepared(geom, views_u8, tex_res, up_res=up_res)
        jax.block_until_ready(tex)
        return tex

    t0 = time.perf_counter(); tex = run_b()
    print(f"phase B cold: {time.perf_counter()-t0:.2f}s")
    for _ in range(2):
        t0 = time.perf_counter(); tex = run_b()
        print(f"phase B warm: {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter(); np.asarray(tex)
    print(f"download tex: {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
