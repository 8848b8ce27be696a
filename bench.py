"""Benchmark: single-image → textured GLB, end-to-end on one TPU chip.

Measures the production hot path (BASELINE.md north star: image→textured GLB
< 10 s) at the reference's fast-path config:

  SHAPE (api_server.py:165,206-209 → 5 steps; octree 384, pipelines.py:687-693)
    stage 1  DINOv2-giant cond encode (518², CFG pair)            [TPU]
    stage 2  5-step mini DiT CFG sampling (one lax.scan)           [TPU]
    stage 3  ShapeVAE hierarchical block-sparse volume decode 384³ [TPU]
    stage 4  surface extraction (host, native surface nets)        [host]
  TEXTURE (texgen/pipelines.py: 6 views, render 2048, texture 2048, bake_exp 4;
           paint-turbo LCM 5 steps at 512² views — multiview_utils.py:92)
    stage 5  mesh postprocess (floater/degenerate/face-reduce)     [host]
    stage 6  UV unwrap + cond-map renders                          [host]
    stage 7  LCM-turbo multiview diffusion, full-size 2.5D UNet    [TPU]
    stage 8  fused native bake (mask+splat+merge) + inpaint        [host]

Weights are randomly initialized (zero-egress environment) — compute cost on
TPU is identical to real checkpoints. Random weights produce a noise SDF
whose active-cell count is pathological for stage 4, so stages 4-8 run on an
analytic sphere grid at the same 385³ resolution (realistic ~1-2 % active
cells and a realistic 40k-face mesh after reduction); stages 1-3 are timed on
the real model outputs with block_until_ready. The reference publishes no
latency numbers (BASELINE.json.published = {}); vs_baseline reports our time
against the 10 s budget (>1 = faster than budget).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


def build_sphere_device(octree):
    import jax
    import jax.numpy as jnp
    import numpy as np

    lin = np.linspace(-1.01, 1.01, octree + 1, dtype=np.float32)
    xx = lin.reshape(-1, 1, 1)
    yy = lin.reshape(1, -1, 1)
    zz = lin.reshape(1, 1, -1)
    sphere = (0.6 - np.sqrt(xx * xx + yy * yy + zz * zz)).astype(np.float32)
    return jax.device_put(jnp.asarray(sphere, jnp.float16))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
    from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor

    octree = 384
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="mini", dino="giant")
    pipe.enable_flashvdm(True, mc_algo="dmc")

    rs = np.random.RandomState(0)
    img = np.zeros((512, 512, 4), np.uint8)
    img[128:384, 128:384, :3] = rs.randint(0, 255, (256, 256, 3))
    img[128:384, 128:384, 3] = 255
    image = Image.fromarray(img)

    def run_device_stages(seed):
        latents = pipe(image=image, num_inference_steps=5, guidance_scale=5.0,
                       output_type="latents", seed=seed)
        # dense grid stays ON DEVICE (latents2mesh transfers only compacted
        # active cells); force materialization with a scalar reduction
        grid = pipe.vae.decode_grid(latents, octree_resolution=octree,
                                    num_chunks=262144)
        return float(jnp.sum(grid))

    # surface stage fixture: analytic sphere at the same 385³ resolution,
    # resident ON DEVICE like the real decode output (random weights would
    # give a noise SDF with pathological active-cell counts)
    import functools

    from hunyuan3d2_tpu.models.shapevae import active_capacity
    from hunyuan3d2_tpu.volume.decoders import extract_active_cells

    sphere_dev = build_sphere_device(octree)
    cap = active_capacity(octree)
    extract = jax.jit(functools.partial(extract_active_cells,
                                        level=0.0, capacity=cap))
    extractor = SurfaceNetsExtractor()

    def run_surface_stage():
        cell_flat, vals, count = extract(sphere_dev)
        return extractor.from_actives(cell_flat, vals, int(count),
                                      octree + 1, 0.0, 1.01)

    # warmup (compile + host allocator arenas: first-touch page faults on
    # this host are ~100 MB/s, so the first surface pass pays ~2 s extra)
    run_device_stages(0)
    run_surface_stage()
    run_surface_stage()

    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        run_device_stages(i + 1)
    device_sec = (time.perf_counter() - t0) / n_runs

    t0 = time.perf_counter()
    for i in range(n_runs):
        out = run_surface_stage()
    host_sec = (time.perf_counter() - t0) / n_runs
    assert out is not None and len(out.mesh_v) > 0

    shape_sec = device_sec + host_sec

    import sys

    print(f"[bench] shape done: {shape_sec:.2f}s", file=sys.stderr, flush=True)

    # ---------------- texture stage (production scale, warm) ----------------
    texture_sec = None
    try:
        from hunyuan3d2_tpu.geometry.mesh import Mesh
        from hunyuan3d2_tpu.geometry.postprocess import (
            DegenerateFaceRemover,
            FaceReducer,
            FloaterRemover,
        )
        from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

        # free the shape-stage device fixtures and offload the shape models
        # to host before the paint stack loads (the tunnel's HBM quota does
        # not fit both stages' params + workspaces; the reference does the
        # same with accelerate CPU offload in low_vram_mode)
        del sphere_dev
        pipe.offload_to_host()
        paint = Hunyuan3DPaintPipeline.init_random(
            jax.random.PRNGKey(1), size="full", view_size=512,
            render_size=2048, texture_size=2048, num_inference_steps=5)
        paint.models["multiview_model"].pipeline.set_turbo(True)

        # postprocess happens once per mesh in the production flow
        # (api_server.py:215-219); timed once, not per paint warmup
        t0 = time.perf_counter()
        m = FloaterRemover()(Mesh(out.mesh_v, out.mesh_f))
        m = DegenerateFaceRemover()(m)
        m = FaceReducer()(m, max_facenum=40000)
        postprocess_sec = time.perf_counter() - t0
        print(f"[bench] postprocess done: {postprocess_sec:.2f}s",
              file=sys.stderr, flush=True)

        paint(m, image)  # warmup (compiles UNet/VAE at production shapes)
        print("[bench] paint warmup done", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        tex_mesh = paint(m, image)
        texture_sec = postprocess_sec + (time.perf_counter() - t0)
        assert tex_mesh is not None
    except Exception:  # pragma: no cover — report shape-only on failure
        import traceback

        traceback.print_exc(file=sys.stderr)

    if texture_sec is None:
        result = {
            "metric": "shape_gen_e2e_sec_mini5step_octree384",
            "value": round(shape_sec, 4),
            "unit": "s",
            "vs_baseline": round(10.0 / shape_sec, 3),
        }
    else:
        total = shape_sec + texture_sec
        result = {
            "metric": "image_to_textured_glb_e2e_sec_turbo5step",
            "value": round(total, 4),
            "unit": "s",
            "vs_baseline": round(10.0 / total, 3),
            "shape_sec": round(shape_sec, 4),
            "texture_sec": round(texture_sec, 4),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
