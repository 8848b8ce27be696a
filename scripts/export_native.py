"""Export a shape-generation pipeline (DINOv2 + DiT + ShapeVAE) to the flat
weight format consumed by the standalone C++ driver (native/standalone/).

Format (little-endian), counterpart of the reference's .gguf conversion for
project/ggml (image3d_shape.cpp:31):

    magic   "HY3DW001" (8 bytes)
    count   int64
    per tensor:
        name_len int32, name bytes (utf-8, '/'-separated pytree path)
        dtype    int32 (0 = float32)
        ndim     int32, dims int64[ndim]
        data     float32[prod(dims)]

Stacked per-layer parameters (lax.scan leading axis) are exported as one
tensor; the C++ side slices layer i from the leading axis.

Config tensors: "cfg/dit", "cfg/vae", "cfg/dino" hold the integer hyper-
parameters so the binary is config-free (mirrors the gguf metadata).

Usage:
    python scripts/export_native.py --out model.hy3dw [--size mini|tiny]
    (random weights; pass --from-pretrained PATH SUBFOLDER for real ones)
"""

import argparse
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}/{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}/{i}"))
    else:
        out[prefix] = np.asarray(tree, np.float32)
    return out


def write_weights(path, tensors: dict):
    with open(path, "wb") as fh:
        fh.write(b"HY3DW001")
        fh.write(struct.pack("<q", len(tensors)))
        for name, arr in tensors.items():
            arr = np.ascontiguousarray(arr, np.float32)
            nb = name.encode("utf-8")
            fh.write(struct.pack("<i", len(nb)))
            fh.write(nb)
            fh.write(struct.pack("<i", 0))
            fh.write(struct.pack("<i", arr.ndim))
            fh.write(struct.pack(f"<{arr.ndim}q", *arr.shape))
            fh.write(arr.tobytes())


def export_pipeline(pipe, path):
    """Hunyuan3DDiTPipeline (ours) → flat weight file."""
    dcfg = pipe.conditioner.main.cfg.dino
    mcfg = pipe.model_cfg
    vcfg = pipe.vae.cfg
    tensors = {}
    tensors.update(flatten_tree(pipe.conditioner.main.params, "dino"))
    tensors.update(flatten_tree(pipe.model_params, "dit"))
    tensors.update(flatten_tree(pipe.vae.params, "vae"))
    tensors["cfg/dino"] = np.asarray(
        [dcfg.hidden_size, dcfg.num_layers, dcfg.num_heads, dcfg.patch_size,
         dcfg.image_size, dcfg.swiglu_hidden, int(dcfg.use_swiglu_ffn)],
        np.float32)
    tensors["cfg/dit"] = np.asarray(
        [mcfg.in_channels, mcfg.context_in_dim, mcfg.hidden_size,
         mcfg.num_heads, mcfg.depth, mcfg.depth_single_blocks,
         int(mcfg.guidance_embed), mcfg.mlp_hidden], np.float32)
    tensors["cfg/vae"] = np.asarray(
        [vcfg.num_latents, vcfg.embed_dim, vcfg.width, vcfg.heads,
         vcfg.num_decoder_layers, vcfg.num_freqs, int(vcfg.include_pi),
         vcfg.scale_factor], np.float32)
    write_weights(path, tensors)
    return tensors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", default="tiny", choices=["tiny", "mini", "full"])
    ap.add_argument("--dino", default="tiny518")
    ap.add_argument("--from-pretrained", nargs=2, metavar=("PATH", "SUBFOLDER"))
    args = ap.parse_args()

    import jax

    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline

    if args.from_pretrained:
        pipe = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
            *args.from_pretrained, dtype=np.float32)
    else:
        pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
            jax.random.PRNGKey(0), size=args.size, dino=args.dino)
    tensors = export_pipeline(pipe, args.out)
    print(f"wrote {len(tensors)} tensors to {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
