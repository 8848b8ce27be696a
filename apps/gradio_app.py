"""Gradio UI for image/text/multiview → 3D.

Behavioral parity: reference gradio_app.py (755 LoC) — tabs for image, text
(t23d) and multiview input (:135-239 _gen_shape, :242-304 generation_all,
:307 shape_generation), HTML model viewer (:103), export with file-type and
face-reduction options (:599), per-stage stats attached to GLB metadata and
shown in the UI, flags --model_path --subfolder --texgen_model_path
--enable_t23d --disable_tex --enable_flashvdm --compile --low_vram_mode
--mc_algo (:647-660), worker init (:695-736).

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

EXPORT_TYPES = ("glb", "obj", "ply", "stl")

HTML_VIEWER = """<!DOCTYPE html>
<html><head>
<script type="module" src="https://ajax.googleapis.com/ajax/libs/model-viewer/3.1.1/model-viewer.min.js"></script>
<style>html,body{{margin:0;height:100%;background:#1b1b1f}}
model-viewer{{width:100%;height:100%}}</style></head>
<body><model-viewer src="{src}" camera-controls auto-rotate shadow-intensity="1"
exposure="0.9" ar></model-viewer></body></html>
"""


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
        if getattr(args, "compile", False):
            self.shape_pipe.compile()
        self.tex_pipe = None
        if not args.disable_tex:
            from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

            if args.random_weights:
                self.tex_pipe = Hunyuan3DPaintPipeline.init_random()
            else:
                self.tex_pipe = Hunyuan3DPaintPipeline.from_pretrained(
                    args.texgen_model_path)
        self.t2i = None
        if args.enable_t23d:
            from hunyuan3d2_tpu.utils.text2image import HunyuanDiTPipeline

            self.t2i = HunyuanDiTPipeline()

    # -- stages --------------------------------------------------------------
    def text_to_image(self, prompt, seed=0):
        """Parity: gradio_app.py t23d path (:163-168)."""
        if self.t2i is None:
            raise RuntimeError("text-to-3D disabled; launch with --enable_t23d")
        return self.t2i(prompt, seed=seed)

    def _prepare_input(self, image=None, mv_images=None, prompt=None, seed=1234):
        if prompt is not None and image is None and mv_images is None:
            image = self.text_to_image(prompt, seed=seed)
        if mv_images is not None:
            views = {k: self.rembg(v) for k, v in mv_images.items()
                     if v is not None}
            if not views:
                raise ValueError("provide at least one view")
            from hunyuan3d2_tpu.utils.imageproc import MVImageProcessorV2

            self.shape_pipe.image_processor = MVImageProcessorV2()
            main = self.shape_pipe.conditioner.main
            if not hasattr(main, "encode_views"):
                # upgrade a single-view Dino tower to the MV wrapper (adds
                # the sincos view embeds; weights unchanged) — proper MV
                # checkpoints load DinoImageEncoderMV directly
                from hunyuan3d2_tpu.models.conditioner import DinoImageEncoderMV

                self.shape_pipe.conditioner.main = DinoImageEncoderMV(
                    main.params, main.cfg)
            return views, views.get("front") or next(iter(views.values()))
        image = self.rembg(image)
        from hunyuan3d2_tpu.utils.imageproc import ImageProcessorV2

        if not isinstance(self.shape_pipe.image_processor, ImageProcessorV2) \
                or type(self.shape_pipe.image_processor) is not ImageProcessorV2:
            self.shape_pipe.image_processor = ImageProcessorV2()
        return image, image

    def gen_shape(self, image=None, mv_images=None, prompt=None, steps=30,
                  guidance_scale=5.0, seed=1234, octree_resolution=256,
                  num_chunks=200000):
        from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS

        stats = {}
        t0 = time.time()
        cond_input, ref_image = self._prepare_input(image, mv_images, prompt,
                                                    seed)
        stats["preprocess"] = time.time() - t0
        t1 = time.time()
        mesh = self.shape_pipe(
            image=cond_input, num_inference_steps=steps,
            guidance_scale=guidance_scale, seed=seed,
            octree_resolution=octree_resolution, num_chunks=num_chunks,
            mc_algo=self.args.mc_algo)[0]
        stats["shape_gen_total"] = time.time() - t1
        stats.update({k: v for k, v in LAST_TIMINGS.items()})
        mesh.metadata["stats"] = stats
        return mesh, ref_image

    def generation_all(self, image=None, mv_images=None, prompt=None, **kwargs):
        from hunyuan3d2_tpu.geometry.postprocess import (
            DegenerateFaceRemover,
            FaceReducer,
            FloaterRemover,
        )

        mesh, ref_image = self.gen_shape(image, mv_images, prompt, **kwargs)
        t0 = time.time()
        mesh = FloaterRemover()(mesh)
        mesh = DegenerateFaceRemover()(mesh)
        mesh = FaceReducer()(mesh)
        textured = self.tex_pipe(mesh, ref_image)
        textured.metadata.update(mesh.metadata)
        textured.metadata.setdefault("stats", {})["texture_total"] = \
            time.time() - t0
        return textured

    # -- export / view ---------------------------------------------------------
    def export(self, mesh, file_type="glb", reduce_faces=None):
        from hunyuan3d2_tpu.geometry.postprocess import FaceReducer

        if file_type not in EXPORT_TYPES:
            raise ValueError(f"file_type must be one of {EXPORT_TYPES}")
        if reduce_faces:
            mesh = FaceReducer()(mesh, max_facenum=int(reduce_faces))
        path = os.path.join(tempfile.gettempdir(),
                            f"hy3d_{uuid.uuid4().hex[:8]}.{file_type}")
        mesh.export(path)
        return path

    def html_viewer(self, glb_path):
        """Write an HTML <model-viewer> page for the GLB (parity:
        gradio_app.py:103 build_model_viewer_html)."""
        html = HTML_VIEWER.format(src=os.path.basename(glb_path))
        out = os.path.splitext(glb_path)[0] + ".html"
        with open(out, "w") as fh:
            fh.write(html)
        return out


def _stats_markdown(mesh):
    stats = mesh.metadata.get("stats", {})
    lines = ["| stage | seconds |", "|---|---|"]
    lines += [f"| {k} | {v:.2f} |" for k, v in stats.items()
              if isinstance(v, (int, float))]
    return "\n".join(lines)


def build_ui(worker):
    import gradio as gr  # raises if unavailable

    with gr.Blocks(title="Hunyuan3D-2 TPU") as demo:
        with gr.Row():
            with gr.Column(scale=1):
                with gr.Tabs():
                    with gr.Tab("Image to 3D"):
                        image = gr.Image(type="pil", label="Input image",
                                         image_mode="RGBA")
                    with gr.Tab("Text to 3D"):
                        prompt = gr.Textbox(
                            label="Prompt",
                            interactive=worker.t2i is not None,
                            placeholder="launch with --enable_t23d"
                            if worker.t2i is None else "a cute cat")
                    with gr.Tab("MultiView to 3D"):
                        mv_front = gr.Image(type="pil", label="front",
                                            image_mode="RGBA")
                        mv_left = gr.Image(type="pil", label="left",
                                           image_mode="RGBA")
                        mv_back = gr.Image(type="pil", label="back",
                                           image_mode="RGBA")
                        mv_right = gr.Image(type="pil", label="right",
                                            image_mode="RGBA")
                with gr.Accordion("Options", open=True):
                    steps = gr.Slider(1, 100, value=30, step=1, label="Steps")
                    guidance = gr.Slider(0, 15, value=5.0, label="Guidance scale")
                    seed = gr.Number(value=1234, label="Seed")
                    octree = gr.Slider(64, 512, value=256, step=16,
                                       label="Octree resolution")
                with gr.Accordion("Export", open=False):
                    ftype = gr.Dropdown(list(EXPORT_TYPES), value="glb",
                                        label="File type")
                    reduce = gr.Checkbox(value=False, label="Reduce faces")
                    reduce_to = gr.Slider(1000, 200000, value=10000, step=1000,
                                          label="Target face count")
                btn_shape = gr.Button("Generate shape", variant="primary")
                btn_all = gr.Button("Generate shape + texture",
                                    interactive=worker.tex_pipe is not None)
            with gr.Column(scale=2):
                out = gr.Model3D(label="Result")
                html = gr.File(label="HTML viewer")
                stats_md = gr.Markdown(label="Stats")

        def _inputs(img, pr, f, l, b, r):
            mv = {k: v for k, v in
                  {"front": f, "left": l, "back": b, "right": r}.items() if v}
            if mv:
                return dict(mv_images=mv)
            if img is None and pr:
                return dict(prompt=pr)
            return dict(image=img)

        def _shape(img, pr, f, l, b, r, steps, guidance, seed, octree,
                   ftype, reduce, reduce_to):
            mesh, _ = worker.gen_shape(
                **_inputs(img, pr, f, l, b, r), steps=int(steps),
                guidance_scale=float(guidance), seed=int(seed),
                octree_resolution=int(octree))
            path = worker.export(mesh, ftype,
                                 int(reduce_to) if reduce else None)
            viewer = worker.html_viewer(path) if ftype == "glb" else None
            return path, viewer, _stats_markdown(mesh)

        def _all(img, pr, f, l, b, r, steps, guidance, seed, octree,
                 ftype, reduce, reduce_to):
            mesh = worker.generation_all(
                **_inputs(img, pr, f, l, b, r), steps=int(steps),
                guidance_scale=float(guidance), seed=int(seed),
                octree_resolution=int(octree))
            path = worker.export(mesh, ftype,
                                 int(reduce_to) if reduce else None)
            viewer = worker.html_viewer(path) if ftype == "glb" else None
            return path, viewer, _stats_markdown(mesh)

        ins = [image, prompt, mv_front, mv_left, mv_back, mv_right,
               steps, guidance, seed, octree, ftype, reduce, reduce_to]
        outs = [out, html, stats_md]
        btn_shape.click(_shape, ins, outs)
        btn_all.click(_all, ins, outs)
    return demo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="tencent/Hunyuan3D-2")
    ap.add_argument("--subfolder", default="hunyuan3d-dit-v2-0")
    ap.add_argument("--texgen_model_path", default="tencent/Hunyuan3D-2")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--device", default="tpu",
                    help="accepted for reference-CLI parity; compute device "
                         "selection is JAX_PLATFORMS on this stack")
    ap.add_argument("--enable_t23d", action="store_true")
    ap.add_argument("--disable_tex", action="store_true")
    ap.add_argument("--enable_flashvdm", action="store_true")
    ap.add_argument("--compile", action="store_true")
    ap.add_argument("--mc_algo", default="mc")
    ap.add_argument("--low_vram_mode", action="store_true")
    ap.add_argument("--cache-path", default=tempfile.gettempdir())
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
