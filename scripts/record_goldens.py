"""Record per-stage golden tensor statistics for cross-implementation parity
(the reference's QA mechanism, SURVEY.md §4.2: size/min/max/mean of every
intermediate frozen as golden values).

With real checkpoints (HY3DGEN_MODELS set) this records the stats the torch
reference prints in its comments (e.g. dinov2_output min/max/mean at
project/image3d/shape.py:150) so they can be diffed directly.

Usage: python scripts/record_goldens.py [--model_path tencent/Hunyuan3D-2mini]
       [--subfolder hunyuan3d-dit-v2-mini] [--out goldens.json] [--random]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="tencent/Hunyuan3D-2mini")
    ap.add_argument("--subfolder", default="hunyuan3d-dit-v2-mini")
    ap.add_argument("--image", default=None)
    ap.add_argument("--out", default="goldens.json")
    ap.add_argument("--random", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from hunyuan3d2_tpu.models import shapevae as sv
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
    from hunyuan3d2_tpu.utils.debug import tensor_stats

    if args.random:
        pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
            jax.random.PRNGKey(0), size="mini", dino="tiny")
    else:
        pipe = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
            args.model_path, subfolder=args.subfolder)

    if args.image:
        image = Image.open(args.image)
    else:
        arr = np.zeros((512, 512, 4), np.uint8)
        arr[128:384, 128:384] = [180, 90, 60, 255]
        image = Image.fromarray(arr)

    goldens = {}
    cond_inputs = pipe.prepare_image(image)
    goldens["image"] = tensor_stats(cond_inputs["image"])
    cond = pipe.encode_cond(cond_inputs["image"], do_cfg=True)
    goldens["cond"] = tensor_stats(cond)
    latents = pipe(image=image, num_inference_steps=5, output_type="latents",
                   seed=12345)
    goldens["latents"] = tensor_stats(latents)
    hidden = sv.decode_latents(pipe.vae.params, pipe.vae.cfg, latents)
    goldens["vae_hidden"] = tensor_stats(hidden)
    grid = pipe.vae.decode_grid(latents, octree_resolution=128, to_host=True)
    goldens["grid_logits"] = tensor_stats(grid)

    with open(args.out, "w") as fh:
        json.dump(goldens, fh, indent=2)
    print(json.dumps(goldens, indent=2))


if __name__ == "__main__":
    main()
