"""Stage-level profile of the full texture pipeline on the real chip.

Replays the bench's texture stage (sphere-fixture mesh → postprocess →
paint at production shapes) twice and prints LAST_TIMINGS after the warm
run — the per-scope breakdown of paint_sec (cond maps, diffusion window,
UV unwrap overlap, bake geometry, texture bake, inpaint).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
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
    from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor

    octree = 384
    lin = np.linspace(-1.01, 1.01, octree + 1, dtype=np.float32)
    r = np.sqrt(lin[:, None, None] ** 2 + lin[None, :, None] ** 2
                + lin[None, None, :] ** 2)
    grid = (0.6 - r).astype(np.float32)[None]
    out = SurfaceNetsExtractor()(grid)[0]
    m = FloaterRemover()(Mesh(out.mesh_v, out.mesh_f))
    m = DegenerateFaceRemover()(m)
    m = FaceReducer()(m, max_facenum=40000)
    print(f"mesh: {len(m.vertices)} verts {len(m.faces)} faces", flush=True)

    arr = np.zeros((512, 512, 4), np.uint8)
    arr[128:384, 128:384] = [180, 90, 60, 255]
    image = Image.fromarray(arr)

    paint = Hunyuan3DPaintPipeline.init_random(
        jax.random.PRNGKey(1), size="full", view_size=512,
        render_size=2048, texture_size=2048, num_inference_steps=10)
    paint.models["multiview_model"].pipeline.set_turbo(True)
    print(f"paint stack up", flush=True)

    for tag in ("warmup", "warm"):
        LAST_TIMINGS.clear()
        t0 = time.perf_counter()
        tex = paint(m, image)
        dt = time.perf_counter() - t0
        assert tex is not None
        print(f"--- {tag}: paint total {dt:.2f}s", flush=True)
        for k, v in LAST_TIMINGS.items():
            print(f"  {k:38s} {v:8.3f}s", flush=True)


if __name__ == "__main__":
    main()
