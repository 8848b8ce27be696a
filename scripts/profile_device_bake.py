"""Profile the device raster/bake pieces at production scale on the chip.

Each stage is timed separately (compile time printed) to localize cost:
cond maps at 512, per-view raster at 2048, full bake at 2048/2048.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.geometry.mesh import Mesh
from hunyuan3d2_tpu.geometry.render import MeshRender
from hunyuan3d2_tpu.geometry.render_tpu import (
    bake_tpu, cond_maps_tpu, upload_mesh)
from hunyuan3d2_tpu.geometry.uv import mesh_uv_wrap
from hunyuan3d2_tpu.ops.rasterize_tpu import rasterize_tpu
from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor
from hunyuan3d2_tpu.geometry.postprocess import FaceReducer


def timed(name, fn, n=3):
    t0 = time.perf_counter()
    r = fn(0)
    print(f"{name:34s} first {time.perf_counter() - t0:6.1f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        fn(i)
    print(f"{name:34s} warm {(time.perf_counter() - t0) / n * 1e3:8.1f} ms",
          flush=True)
    return r


def main():
    lin = np.linspace(-1.01, 1.01, 96)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    g = ((0.5 - np.sqrt(x * x + y * y + z * z))
         + 0.22 * np.sin(6 * x) * np.sin(6 * y) * np.sin(6 * z))[None]
    out = SurfaceNetsExtractor()(g.astype(np.float32), mc_level=0.0)[0]
    m = FaceReducer()(Mesh(out.mesh_v, out.mesh_f), max_facenum=40000)
    print("faces:", len(m.faces), flush=True)
    m = mesh_uv_wrap(m)
    r = MeshRender(default_resolution=2048, texture_size=2048)
    r.load_mesh(m)
    dev = upload_mesh(r, need_uv=True)
    assert dev is not None
    elevs = [0, 0, 0, 0, 90, -90]
    azims = [0, 90, 180, 270, 0, 180]
    weights = [1, 0.1, 0.5, 0.1, 0.05, 0.05]
    mvs = jnp.asarray(np.stack([r._mvp(e, a)[0] for e, a in zip(elevs, azims)]))
    mvps = jnp.asarray(np.stack([r._mvp(e, a)[1] for e, a in zip(elevs, azims)]))

    def sync(x):
        return float(jnp.sum(x[0].astype(jnp.float32))) if isinstance(x, tuple) \
            else float(jnp.sum(x.astype(jnp.float32)))

    ones = jnp.ones((dev.verts.shape[0], 1), jnp.float32)
    vh = jnp.concatenate([dev.verts, ones], axis=1)

    raster1 = jax.jit(lambda mvp: rasterize_tpu(vh @ mvp.T, dev.faces,
                                                2048, 2048).depth)
    timed("single raster 2048", lambda i: sync(raster1(mvps[i % 6])))

    timed("cond_maps 512 x6",
          lambda i: sync(cond_maps_tpu(dev, mvps + i * 1e-6, 512)[0]
                         .astype(jnp.float32)))

    views = jnp.zeros((6, 512, 512, 3), jnp.uint8)
    timed("bake 2048/2048 x6",
          lambda i: sync(bake_tpu(dev, mvs, mvps + i * 1e-6, views,
                                  jnp.asarray(weights, jnp.float32),
                                  render_res=2048, tex_res=2048, exp=4.0)))


if __name__ == "__main__":
    main()
