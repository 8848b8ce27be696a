"""Benchmark: single-image shape generation, end-to-end on one TPU chip.

Measures the production hot path (BASELINE.md: "sec per image→textured mesh
on v5e-8; DiT denoise steps/sec and VAE decode sec") at the reference's API
fast-path config (api_server.py:165,206-209 → 5 steps, FlashVDM-class
hierarchical decode; octree 384 per the default shape config):

  DINOv2-giant cond encode → 5-step mini DiT CFG sampling (lax.scan)
  → ShapeVAE hierarchical block-sparse volume decode @ 384³
  → surface-nets extraction (host) → mesh.

Weights are randomly initialized (no egress in this environment); compute
cost is identical to real checkpoints. The reference publishes no latency
numbers (BASELINE.json.published = {}), so vs_baseline reports our time
against the repo's 10 s image→textured-GLB north-star budget (>1 means
faster than budget).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="mini", dino="giant")
    pipe.enable_flashvdm(True, mc_algo="dmc")

    rs = np.random.RandomState(0)
    img = np.zeros((512, 512, 4), np.uint8)
    img[128:384, 128:384, :3] = rs.randint(0, 255, (256, 256, 3))
    img[128:384, 128:384, 3] = 255
    image = Image.fromarray(img)

    kwargs = dict(num_inference_steps=5, guidance_scale=5.0,
                  octree_resolution=384, num_chunks=262144, mc_algo="dmc")

    # warmup (compile)
    pipe(image=image, seed=12345, **kwargs)

    n_runs = 3
    t0 = time.perf_counter()
    for i in range(n_runs):
        meshes = pipe(image=image, seed=i, **kwargs)
    elapsed = (time.perf_counter() - t0) / n_runs

    del meshes
    result = {
        "metric": "shape_gen_e2e_sec_mini5step_octree384",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / elapsed, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
