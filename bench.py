"""Benchmark: single-image → textured GLB, end-to-end on one TPU chip.

Measures the production hot path (BASELINE.md north star: image→textured GLB
< 10 s) at the reference's fast-path config:

  SHAPE (api_server.py:165,206-209 → 5 steps; octree 384, pipelines.py:687-693)
    stage 1  DINOv2-giant cond encode (518², CFG pair)            [TPU]
    stage 2  5-step mini DiT CFG sampling (one lax.scan)           [TPU]
    stage 3  ShapeVAE hierarchical block-sparse volume decode 384³ [TPU]
             (the production "actives" program used by latents2mesh)
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

Robustness contract (the driver records this script's output tail and kills
it with `timeout`): a complete shape-stage JSON record is printed the moment
the shape stages finish, so a texture-stage blowup can never zero the round;
if the texture stage completes, the full-path record is printed as the LAST
line (the driver parses the last JSON line). Every stage runs under its own
SIGALRM wall-clock guard and the whole run respects an internal budget
(HY3D_BENCH_BUDGET seconds, default 2700) after which remaining stages are
skipped and the best record so far stands.

MFU fields: analytic-free FLOP counts from XLA's own cost model
(compiled.cost_analysis()['flops']) for the DiT denoise loop and the volume
decode, divided by measured wall-clock and TPU v5e bf16 peak (197 TFLOP/s).

Prints one JSON record per completed milestone; the LAST line is the
authoritative one: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import signal
import sys
import time

T0 = time.perf_counter()
BUDGET = float(os.environ.get("HY3D_BENCH_BUDGET", "2700"))
PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (one chip)


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def remaining():
    return BUDGET - (time.perf_counter() - T0)


class StageTimeout(RuntimeError):
    pass


class stage_guard:
    """SIGALRM wall-clock bound for one stage (main thread only)."""

    def __init__(self, seconds, name):
        self.seconds = max(1, int(seconds))
        self.name = name

    def __enter__(self):
        def _fire(signum, frame):
            raise StageTimeout(f"stage '{self.name}' exceeded {self.seconds}s")

        self._old = signal.signal(signal.SIGALRM, _fire)
        signal.alarm(self.seconds)
        return self

    def __exit__(self, *exc):
        signal.alarm(0)
        signal.signal(signal.SIGALRM, self._old)
        return False


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


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


def _flops_of(lowered):
    """XLA cost-model FLOPs of a lowered jit program (None if unavailable)."""
    try:
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def shape_stage():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from hunyuan3d2_tpu.models import shapevae as sv
    from hunyuan3d2_tpu.pipelines import shapegen as sg
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
    from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor

    octree = 384
    num_chunks = 262144
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="mini", dino="giant")
    pipe.enable_flashvdm(True, mc_algo="dmc")
    log(f"init done at t={time.perf_counter() - T0:.1f}s")

    rs = np.random.RandomState(0)
    img = np.zeros((512, 512, 4), np.uint8)
    img[128:384, 128:384, :3] = rs.randint(0, 255, (256, 256, 3))
    img[128:384, 128:384, 3] = 255
    image = Image.fromarray(img)

    dec = pipe.vae.volume_decoder

    def run_latents(seed):
        lat = pipe(image=image, num_inference_steps=5, guidance_scale=5.0,
                   output_type="latents", seed=seed)
        lat.block_until_ready()
        return lat

    def run_decode(lat):
        # the production program: latents2mesh's compacted-actives decode
        # (models/shapevae.py:441) — dense grid never leaves the device
        hidden = sv._decode_latents_jit(pipe.vae.params, pipe.vae.cfg, lat)
        kv = sv._compute_kv_jit(pipe.vae.params, pipe.vae.cfg, hidden)
        out = sv._grid_decode_jit(
            pipe.vae.params, pipe.vae.cfg, kv, "flashvdm", octree, num_chunks,
            1.01, 0.0, dec.block, dec.capacity_frac, dec.coarse_factor,
            "actives", getattr(dec, "topk_mode", "mean"))
        jax.block_until_ready(out)
        return out

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

    def run_surface():
        cell_flat, vals, count = extract(sphere_dev)
        return extractor.from_actives(cell_flat, vals, int(count),
                                      octree + 1, 0.0, 1.01)

    # warmup (compiles; persistent cache makes re-runs cheap). Host allocator
    # arenas first-touch at ~100 MB/s on this host → run surface twice.
    with stage_guard(min(1200, remaining() - 60), "shape warmup"):
        lat = run_latents(0)
        log(f"warmup latents done at t={time.perf_counter() - T0:.1f}s")
        run_decode(lat)
        log(f"warmup decode done at t={time.perf_counter() - T0:.1f}s")
        run_surface()
        run_surface()
        log(f"warmup surface done at t={time.perf_counter() - T0:.1f}s")

    n_runs = 3
    t_lat, t_dec, t_surf = [], [], []
    out = None
    with stage_guard(min(600, remaining() - 30), "shape measure"):
        for i in range(n_runs):
            t0 = time.perf_counter()
            lat = run_latents(i + 1)
            t_lat.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_decode(lat)
            t_dec.append(time.perf_counter() - t0)
        for i in range(n_runs):
            t0 = time.perf_counter()
            out = run_surface()
            t_surf.append(time.perf_counter() - t0)
    assert out is not None and len(out.mesh_v) > 0

    lat_sec, dec_sec, surf_sec = median(t_lat), median(t_dec), median(t_surf)
    shape_sec = lat_sec + dec_sec + surf_sec
    log(f"shape done: {shape_sec:.2f}s (cond+dit {lat_sec:.2f} decode "
        f"{dec_sec:.2f} surface {surf_sec:.2f})")

    # ---- MFU from XLA's cost model (VERDICT r2 #3) --------------------------
    mfu = {}
    try:
        with stage_guard(120, "mfu accounting"):
            ci = pipe.prepare_image(image)
            cond = pipe.encode_cond(ci["image"], True)
            sigmas = jnp.asarray(pipe.scheduler.make_sigmas(5, None))
            lat0 = pipe.prepare_latents(1, jax.random.PRNGKey(0))
            dit_flops = _flops_of(sg._sample_loop.lower(
                pipe.model_params, pipe.model_cfg, lat0, cond, sigmas,
                jnp.float32(5.0), True, False))
            hidden = sv._decode_latents_jit(pipe.vae.params, pipe.vae.cfg, lat)
            kv = sv._compute_kv_jit(pipe.vae.params, pipe.vae.cfg, hidden)
            dec_flops = _flops_of(sv._grid_decode_jit.lower(
                pipe.vae.params, pipe.vae.cfg, kv, "flashvdm", octree,
                num_chunks, 1.01, 0.0, dec.block, dec.capacity_frac,
                dec.coarse_factor, "actives", getattr(dec, "topk_mode", "mean")))
            # the measured cond+dit window = preprocess + DINOv2-giant encode
            # + 5-step DiT loop; count the encode FLOPs too so its MFU
            # reflects the window's actual compute
            from hunyuan3d2_tpu.models import dinov2 as dino_lib

            enc = pipe.conditioner.main
            pix = enc.preprocess(ci["image"])
            dino_flops = _flops_of(dino_lib.apply_jit.lower(
                enc.params, enc.cfg.dino, pix))
            if dit_flops:
                mfu["dit_denoise_tflops"] = round(dit_flops / 1e12, 2)
                window = dit_flops + (dino_flops or 0.0)
                mfu["mfu_cond_dit"] = round(window / lat_sec / PEAK_BF16, 4)
            if dino_flops:
                mfu["dino_encode_tflops"] = round(dino_flops / 1e12, 2)
            if dec_flops:
                mfu["volume_decode_tflops"] = round(dec_flops / 1e12, 2)
                mfu["mfu_volume_decode"] = round(dec_flops / dec_sec / PEAK_BF16, 4)
    except Exception as e:  # pragma: no cover
        log(f"mfu accounting skipped: {e!r}")

    record = {
        "metric": "shape_gen_e2e_sec_mini5step_octree384",
        "value": round(shape_sec, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / shape_sec, 3),
        "cond_dit_sec": round(lat_sec, 4),
        "volume_decode_sec": round(dec_sec, 4),
        "surface_sec": round(surf_sec, 4),
        **mfu,
    }
    return record, pipe, out, image


def texture_stage(pipe, out, image):
    import jax

    from hunyuan3d2_tpu.geometry.mesh import Mesh
    from hunyuan3d2_tpu.geometry.postprocess import (
        DegenerateFaceRemover,
        FaceReducer,
        FloaterRemover,
    )
    from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

    # offload the shape models to host before the paint stack loads (the
    # tunnel's HBM quota does not fit both stages' params + workspaces; the
    # reference does the same with accelerate CPU offload in low_vram_mode)
    pipe.offload_to_host()
    paint = Hunyuan3DPaintPipeline.init_random(
        jax.random.PRNGKey(1), size="full", view_size=512,
        render_size=2048, texture_size=2048, num_inference_steps=5)
    paint.models["multiview_model"].pipeline.set_turbo(True)
    log(f"paint init done at t={time.perf_counter() - T0:.1f}s")

    # postprocess happens once per mesh in the production flow
    # (api_server.py:215-219); timed once, not per paint warmup
    with stage_guard(min(300, remaining() - 30), "postprocess"):
        t0 = time.perf_counter()
        m = FloaterRemover()(Mesh(out.mesh_v, out.mesh_f))
        m = DegenerateFaceRemover()(m)
        m = FaceReducer()(m, max_facenum=40000)
        postprocess_sec = time.perf_counter() - t0
    log(f"postprocess done: {postprocess_sec:.2f}s")

    with stage_guard(remaining() - 30, "paint warmup"):
        paint(m, image)  # warmup (compiles UNet/VAE at production shapes)
    log(f"paint warmup done at t={time.perf_counter() - T0:.1f}s")

    with stage_guard(min(600, remaining() - 15), "paint measure"):
        t0 = time.perf_counter()
        tex_mesh = paint(m, image)
        paint_sec = time.perf_counter() - t0
    assert tex_mesh is not None
    log(f"paint done: {paint_sec:.2f}s")
    return {"postprocess_sec": round(postprocess_sec, 4),
            "paint_sec": round(paint_sec, 4)}


def main():
    record, pipe, out, image = shape_stage()
    # print the shape milestone NOW — a texture blowup can't zero the round
    print(json.dumps(record), flush=True)

    if remaining() < 240:
        log(f"skipping texture stage: {remaining():.0f}s left of budget")
        return
    try:
        tex = texture_stage(pipe, out, image)
    except Exception:
        import traceback

        traceback.print_exc(file=sys.stderr)
        return
    texture_sec = tex["postprocess_sec"] + tex["paint_sec"]
    total = record["value"] + texture_sec
    full = {
        "metric": "image_to_textured_glb_e2e_sec_turbo5step",
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / total, 3),
        "shape_sec": record["value"],
        "texture_sec": round(texture_sec, 4),
        **{k: v for k, v in record.items()
           if k not in ("metric", "value", "unit", "vs_baseline")},
        **tex,
    }
    print(json.dumps(full), flush=True)


if __name__ == "__main__":
    main()
