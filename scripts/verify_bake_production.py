"""Device-vs-host bake agreement at PRODUCTION sizes (VERDICT r4 #4).

Runs the device texture bake (geometry/render_tpu.py gather formulation) and
the host bake (geometry/render.py prepare/bake, the exact-parity path) on the
same ~40k-face mesh with 2048² bake raster, 2048² texture, and 512² views —
the reference's production configuration (texgen/pipelines.py:50-52) — and
prints the mean |delta| over mutually-trusted texels plus per-phase wall
times.

Run on the real TPU:    python scripts/verify_bake_production.py
CPU (slow, interpret):  JAX_PLATFORMS=cpu python scripts/verify_bake_production.py --small
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
    grid_res = 30 if small else 100  # 100 → ~44k-face SDF sphere

    from hunyuan3d2_tpu.geometry.mesh import Mesh
    from hunyuan3d2_tpu.geometry.render import MeshRender
    from hunyuan3d2_tpu.geometry.render_tpu import bake_tpu, upload_mesh
    from hunyuan3d2_tpu.geometry.uv import mesh_uv_wrap
    from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor

    lin = np.linspace(-1.01, 1.01, grid_res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = (0.85 - np.sqrt(x * x + y * y + z * z))[None].astype(np.float32)
    out = SurfaceNetsExtractor()(g, mc_level=0.0)[0]
    mesh = mesh_uv_wrap(Mesh(out.mesh_v, out.mesh_f))
    print(f"mesh: {len(mesh.vertices)} verts {len(mesh.faces)} faces; "
          f"raster {render_res} tex {tex_res} views {view_res} up {up_res}")
    r = MeshRender(default_resolution=render_res, texture_size=tex_res)
    r.load_mesh(mesh)
    dev = upload_mesh(r, need_uv=True)
    assert dev is not None

    views = [(0, 0), (0, 90), (0, 180), (0, 270), (90, 0), (-90, 180)]
    elevs = [e for e, _ in views]
    azims = [a for _, a in views]
    weights = [1, 0.1, 0.5, 0.1, 0.05, 0.05]
    mvs = np.stack([r._mvp(e, a)[0] for e, a in views]).astype(np.float32)
    mvps = np.stack([r._mvp(e, a)[1] for e, a in views]).astype(np.float32)

    # smooth synthetic views (the gather and splat discretizations only
    # agree on smooth content; real diffusion output is smooth at this scale)
    gy, gx = np.mgrid[0:view_res, 0:view_res].astype(np.float32)
    gy, gx = gy / (view_res - 1), gx / (view_res - 1)
    views_u8 = np.stack([
        np.stack([gx * 255, gy * 255,
                  (i / 5.0) * np.ones_like(gx) * 255], axis=-1)
        .astype(np.uint8) for i in range(6)])

    t0 = time.perf_counter()
    tex_d, trust_d = bake_tpu(
        dev, jnp.asarray(mvs), jnp.asarray(mvps), jnp.asarray(views_u8),
        jnp.asarray(weights, jnp.float32), render_res=render_res,
        tex_res=tex_res, exp=4)
    tex_d = np.asarray(tex_d)
    trust_d = np.asarray(trust_d)
    t_dev = time.perf_counter() - t0
    # warm re-run: the compile-free serving cost
    t0 = time.perf_counter()
    tex_d2, _ = bake_tpu(
        dev, jnp.asarray(mvs), jnp.asarray(mvps), jnp.asarray(views_u8),
        jnp.asarray(weights, jnp.float32), render_res=render_res,
        tex_res=tex_res, exp=4)
    np.asarray(tex_d2)
    t_dev_warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    geom = r.prepare_bake_geometry(elevs, azims)
    host_tex, host_mask = r.bake_texture_prepared(views_u8, geom, exp=4,
                                                  weights=weights)
    t_host = time.perf_counter() - t0

    both = (trust_d > 1e-3) & host_mask[..., 0]
    diff = np.abs(tex_d - host_tex)[both]
    print(f"trusted texels: device {(trust_d > 1e-3).mean():.3f} "
          f"host {host_mask[..., 0].mean():.3f} both {both.mean():.3f}")
    print(f"mean |delta| on mutually-trusted texels: {diff.mean():.5f} "
          f"({diff.mean() * 255:.2f}/255), p99 {np.quantile(diff, 0.99):.4f}")
    print(f"wall: device cold {t_dev:.2f}s warm {t_dev_warm:.2f}s, "
          f"host {t_host:.2f}s")
    assert diff.mean() < 0.03, f"device-vs-host delta {diff.mean()}"
    print("OK")


if __name__ == "__main__":
    main()
