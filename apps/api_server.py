"""HTTP model server: image → (textured) GLB.

Behavioral parity: reference api_server.py — POST /generate sync (:244),
POST /send fire-and-forget (:277), GET /status/{uid} polling (:287), a
ModelWorker that loads shapegen (+FlashVDM, :165) and optional texgen
(:170-171), request params seed/octree_resolution/num_inference_steps/
guidance_scale/texture/face_count/type (:204-221), rotating-file logging
(:52-126). FastAPI isn't in this image, so the server is a stdlib
ThreadingHTTPServer with the same routes and JSON contracts — the Blender
addon's /send + /status flow works unchanged.

Run:  python apps/api_server.py --port 8081 [--random-weights] [--enable_tex]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import logging
import logging.handlers
import os
import sys
import tempfile
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAVE_DIR = tempfile.gettempdir()
logger = logging.getLogger("hy3d_api")


def build_logger(log_dir: str = None):
    logger.setLevel(logging.INFO)
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter("[%(asctime)s] %(levelname)s %(message)s"))
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.handlers.TimedRotatingFileHandler(
            os.path.join(log_dir, "api_server.log"), when="D", utc=True)
        fh.setFormatter(logging.Formatter("[%(asctime)s] %(levelname)s %(message)s"))
        logger.addHandler(fh)


class ModelWorker:
    """Parity: api_server.py ModelWorker (:145-229)."""

    def __init__(self, model_path="tencent/Hunyuan3D-2", subfolder="hunyuan3d-dit-v2-0",
                 enable_tex=False, random_weights=False, tex_model_path=None,
                 limit_model_concurrency: int = 5):
        import threading

        import jax

        from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
        from hunyuan3d2_tpu.utils.rembg import BackgroundRemover

        self.worker_id = str(uuid.uuid4())[:6]
        self.random_weights = random_weights
        self.pipeline_t2i = None
        self._t2i_lock = threading.Lock()
        # parity: api_server.py --limit-model-concurrency (the reference
        # gates concurrent generations with a semaphore)
        self.model_semaphore = threading.Semaphore(limit_model_concurrency)
        self.rembg = BackgroundRemover()
        if random_weights:
            size = os.environ.get("HY3D_RANDOM_SIZE", "mini")
            self.pipeline = Hunyuan3DDiTFlowMatchingPipeline.init_random(
                jax.random.PRNGKey(0), size=size, dino="tiny")
        else:
            self.pipeline = Hunyuan3DDiTFlowMatchingPipeline.from_pretrained(
                model_path, subfolder=subfolder)
        self.pipeline.enable_flashvdm(True, mc_algo="mc")
        self.pipeline_tex = None
        if enable_tex:
            from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

            if random_weights:
                self.pipeline_tex = Hunyuan3DPaintPipeline.init_random()
            else:
                self.pipeline_tex = Hunyuan3DPaintPipeline.from_pretrained(
                    tex_model_path or model_path)

    def generate(self, uid: str, params: dict) -> str:
        from PIL import Image

        self.model_semaphore.acquire()
        try:
            return self._generate(uid, params)
        finally:
            self.model_semaphore.release()

    def _generate(self, uid: str, params: dict) -> str:
        from PIL import Image

        from hunyuan3d2_tpu.geometry.postprocess import (
            DegenerateFaceRemover,
            FaceReducer,
            FloaterRemover,
        )

        if "image" in params:
            img_bytes = base64.b64decode(params["image"])
            image = Image.open(io.BytesIO(img_bytes))
        elif "text" in params:
            # t23d front-end (parity: reference api_server.py:192-194 —
            # prompt → HunyuanDiT image → shape). Lazily constructed: the
            # JAX-native pipeline when a checkpoint/random-weight mode is
            # available, else the diffusers/sidecar backends.
            # double-checked under a lock: up to limit_model_concurrency
            # requests run here concurrently, and two simultaneous loads
            # would duplicate a multi-GB checkpoint read + jit compiles
            with self._t2i_lock:
                if self.pipeline_t2i is None:
                    from hunyuan3d2_tpu.utils.text2image import (
                        HunyuanDiTPipeline,
                    )

                    if self.random_weights:
                        os.environ.setdefault("HY3D_RANDOM_WEIGHTS", "1")
                    self.pipeline_t2i = HunyuanDiTPipeline(
                        model_path=os.environ.get(
                            "HY3D_T2I_MODEL",
                            "Tencent-Hunyuan/HunyuanDiT-v1.1-Diffusers-Distilled"))
            image = self.pipeline_t2i(params["text"],
                                      seed=params.get("seed", 0))
        else:
            raise ValueError("No input image or text provided")
        image = self.rembg(image)

        seed = params.get("seed", 1234)
        octree_resolution = params.get("octree_resolution", 128)
        num_inference_steps = params.get("num_inference_steps", 5)
        guidance_scale = params.get("guidance_scale", 5.0)

        mesh = self.pipeline(
            image=image, seed=seed,
            octree_resolution=octree_resolution,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            mc_algo=params.get("mc_algo", "mc"),
        )[0]

        if params.get("texture", False) and self.pipeline_tex is not None:
            mesh = FloaterRemover()(mesh)
            mesh = DegenerateFaceRemover()(mesh)
            mesh = FaceReducer()(mesh, max_facenum=params.get("face_count", 40000))
            mesh = self.pipeline_tex(mesh, image)

        out_type = params.get("type", "glb")
        path = os.path.join(SAVE_DIR, f"{uid}.{out_type}")
        mesh.export(path)
        return path


WORKER: ModelWorker = None
STATUS = {}  # uid -> {"status": ..., "path": ...}


def _run_job(uid: str, params: dict):
    STATUS[uid] = {"status": "processing"}
    try:
        path = WORKER.generate(uid, params)
        STATUS[uid] = {"status": "completed", "path": path}
    except Exception as e:  # noqa: BLE001 — serving resilience, parity :249-274
        logger.exception("generation failed")
        STATUS[uid] = {"status": "error", "message": str(e)}


class Handler(BaseHTTPRequestHandler):
    def _json(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _file(self, path: str):
        with open(path, "rb") as fh:
            data = fh.read()
        self.send_response(200)
        self.send_header("Content-Type", "model/gltf-binary")
        self.send_header("Content-Disposition",
                         f'attachment; filename="{os.path.basename(path)}"')
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, fmt, *args):
        logger.info("%s " + fmt, self.address_string(), *args)

    def do_GET(self):
        if self.path.startswith("/status/"):
            uid = self.path.split("/status/", 1)[1]
            st = STATUS.get(uid)
            if st is None:
                return self._json(404, {"status": "not_found"})
            if st["status"] == "completed":
                with open(st["path"], "rb") as fh:
                    b64 = base64.b64encode(fh.read()).decode()
                return self._json(200, {"status": "completed", "model_base64": b64})
            return self._json(200, st)
        if self.path == "/healthz":
            return self._json(200, {"status": "ok", "worker_id": WORKER.worker_id})
        return self._json(404, {"error": "unknown route"})

    def do_POST(self):
        length = int(self.headers.get("Content-Length", 0))
        try:
            params = json.loads(self.rfile.read(length) or b"{}")
        except json.JSONDecodeError:
            return self._json(400, {"error": "invalid json"})
        uid = str(uuid.uuid4())
        if self.path == "/generate":
            try:
                path = WORKER.generate(uid, params)
                return self._file(path)
            except ValueError as e:
                return self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                logger.exception("generate failed")
                return self._json(500, {"error": str(e)})
        if self.path == "/send":
            threading.Thread(target=_run_job, args=(uid, params), daemon=True).start()
            return self._json(200, {"uid": uid})
        return self._json(404, {"error": "unknown route"})


def main():
    global WORKER
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("--model_path", default="tencent/Hunyuan3D-2")
    ap.add_argument("--subfolder", default="hunyuan3d-dit-v2-0")
    ap.add_argument("--tex_model_path", default=None,
                    help="texgen checkpoint path (defaults to --model_path)")
    ap.add_argument("--device", default="tpu",
                    help="accepted for reference-CLI parity; compute device "
                         "selection is JAX_PLATFORMS on this stack")
    ap.add_argument("--limit-model-concurrency", type=int, default=5)
    ap.add_argument("--enable_tex", action="store_true")
    ap.add_argument("--random-weights", action="store_true",
                    help="random-init models (no checkpoint download)")
    ap.add_argument("--log_dir", default=None)
    args = ap.parse_args()

    build_logger(args.log_dir)
    WORKER = ModelWorker(args.model_path, args.subfolder, args.enable_tex,
                         args.random_weights, tex_model_path=args.tex_model_path,
                         limit_model_concurrency=args.limit_model_concurrency)
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    logger.info("serving on %s:%d (worker %s)", args.host, args.port,
                WORKER.worker_id)
    server.serve_forever()


if __name__ == "__main__":
    main()
