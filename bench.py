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
           paint-turbo LCM 10 steps at 512² views — the reference turbo's
           exact schedule, DDIM table[29..2:3] = t 989→98,
           hunyuanpaint/pipeline.py:598-603)
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

MFU fields: analytic FLOP counts (2*params*tokens + attention terms; XLA's
own cost model counts lax.scan bodies once, undercounting scanned programs)
for the DiT denoise window (incl. DINOv2 encode) and the volume decode,
divided by measured wall-clock and TPU v5e bf16 peak (197 TFLOP/s).

Prints one JSON record per completed milestone; the LAST line is the
authoritative one: {"metric", "value", "unit", "vs_baseline", ...}.

Un-zeroable contract (VERDICT r3 #1): the TPU backend is probed in a
SUBPROCESS with its own timeout and retried with backoff before anything
heavy imports jax in-process (the r3 failure was a fatal 'axon UNAVAILABLE'
at t≈0; the r4 builder session also observed the init *hanging* >8 min, so
an in-process probe alone can deadlock the whole bench). Any exception or a
driver SIGTERM still prints a last-line JSON record — either the best
milestone recorded so far or an explicit {"metric": "bench_error", ...} —
so the driver's `parsed` field can never be null again.
"""

import json
import os
import signal
import subprocess
import sys
import time

T0 = time.perf_counter()
BUDGET = float(os.environ.get("HY3D_BENCH_BUDGET", "2700"))
PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (one chip)

# HY3D_BENCH_SMOKE=1: tiny configs so the ENTIRE bench control flow
# (preflight, all stages, single-pass, emergency paths) can be exercised on
# CPU — plumbing is validated before the driver's real TPU run
SMOKE = os.environ.get("HY3D_BENCH_SMOKE", "0") == "1"
if SMOKE:
    SHAPE_SIZE, DINO, OCTREE, NUM_CHUNKS = "tiny", "tiny", 64, 32768
    PAINT_SIZE, VIEW, RENDER, TEXTURE = "tiny", 32, 64, 64
else:
    SHAPE_SIZE, DINO, OCTREE, NUM_CHUNKS = "mini", "giant", 384, 262144
    PAINT_SIZE, VIEW, RENDER, TEXTURE = "full", 512, 2048, 2048

# Persistent XLA compile cache (VERDICT r3 #2): hunyuan3d2_tpu/__init__
# configures jax_compilation_cache_dir at import (.jax_cache_<platform>,
# host-fingerprinted for CPU) — in JAX 0.9 the JAX_COMPILATION_CACHE_DIR /
# JAX_PERSISTENT_CACHE_* env vars are SILENTLY IGNORED, only
# jax.config.update works (verified write+hit on the axon TPU backend), so
# the cache state must be read back from the live config, not assumed.


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def remaining():
    return BUDGET - (time.perf_counter() - T0)


def log_cache_state(tag):
    """Log persistent-compile-cache population (VERDICT r3 #2: per-program
    hit/miss visibility; a growth of 0 between tags = all programs hit).
    Reads the LIVE config value — round 4's first run logged "0 entries"
    because this pointed at a hardcoded dir the config never used."""
    try:
        import jax

        d = jax.config.jax_compilation_cache_dir
        n = len(os.listdir(d)) if d and os.path.isdir(d) else 0
        log(f"compile cache [{tag}]: {n} entries in {d}")
    except Exception as e:
        log(f"compile cache [{tag}]: unreadable ({e})")


_BEST = None  # most complete milestone record printed so far


def emit(record, best=True):
    """Print a milestone JSON record; remember the most complete one so the
    emergency paths (exception / SIGTERM) can re-print it as the last line."""
    global _BEST
    print(json.dumps(record), flush=True)
    if best:
        _BEST = record


def _emergency_exit(reason):
    if _BEST is not None:
        rec = dict(_BEST)
        rec["note"] = f"emergency flush: {reason}"
        print(json.dumps(rec), flush=True)
    else:
        print(json.dumps({
            "metric": "bench_error", "value": -1.0, "unit": "s",
            "vs_baseline": 0.0, "error": reason[:2000],
        }), flush=True)
    sys.stdout.flush()
    os._exit(0)


def _install_sigterm_flush():
    def _on_term(signum, frame):
        log(f"signal {signum} received — flushing best record")
        _emergency_exit(f"terminated by signal {signum}")

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)


_PROBE_SRC = """
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
(x @ x).block_until_ready()
print(f"probe ok: {d[0].platform} x{len(d)} in {time.time()-t0:.1f}s",
      flush=True)
"""


def preflight(max_tries=5):
    """Probe TPU backend init in a subprocess (own timeout) with backoff.
    Returns True once a probe ran a real device op; False if the backend
    stayed unavailable within the budget."""
    backoff = 15.0
    for i in range(max_tries):
        probe_timeout = min(420.0, max(60.0, remaining() - 120.0))
        if remaining() < 90:
            log("preflight: budget exhausted")
            return False
        log(f"preflight try {i + 1}/{max_tries} "
            f"(timeout {probe_timeout:.0f}s, t={time.perf_counter() - T0:.0f}s)")
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                timeout=probe_timeout, capture_output=True, text=True)
            if r.returncode == 0:
                log(f"preflight: {r.stdout.strip()}")
                return True
            tail = (r.stderr or "").strip().splitlines()
            log(f"preflight rc={r.returncode}: "
                f"{tail[-1] if tail else 'no stderr'}")
        except subprocess.TimeoutExpired:
            log("preflight: probe timed out (backend init hang)")
        time.sleep(min(backoff, max(0.0, remaining() - 60)))
        backoff *= 2
    return False


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
    # computed on device: host numpy first-touch over 385^3 costs ~70 s on
    # this host (measured), the jitted version is milliseconds
    import jax
    import jax.numpy as jnp

    def _sphere():
        lin = jnp.linspace(-1.01, 1.01, octree + 1, dtype=jnp.float32)
        r = jnp.sqrt(lin[:, None, None] ** 2 + lin[None, :, None] ** 2
                     + lin[None, None, :] ** 2)
        return (0.6 - r).astype(jnp.float16)

    out = jax.jit(_sphere)()
    out.block_until_ready()
    return out


def shape_stage(size=None, metric=None, surf_reuse=None, reserve=60):
    """Shape stages 1-4 for one model size. ``size`` defaults to the bench
    config (mini); size='full' is the v2-0 flagship (1.1B DiT + 3072-latent
    VAE — reference pipelines.py:470-485, the default `from_pretrained`
    config). ``surf_reuse=(mesh, transfer_sec)`` skips the sphere-fixture
    surface sub-stage and reuses the mini stage's numbers (the fixture and
    the transfer cost depend only on octree, not the model). ``reserve``
    seconds are left untouched for later stages."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from hunyuan3d2_tpu.models import shapevae as sv
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
    from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor

    size = size or SHAPE_SIZE
    metric = metric or f"shape_gen_e2e_sec_{SHAPE_SIZE}5step_octree{OCTREE}"
    octree = OCTREE
    num_chunks = NUM_CHUNKS
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size=size, dino=DINO)
    pipe.enable_flashvdm(True, mc_algo="dmc")
    log(f"init done ({size}) at t={time.perf_counter() - T0:.1f}s")

    rs = np.random.RandomState(0)
    img = np.zeros((512, 512, 4), np.uint8)
    img[128:384, 128:384, :3] = rs.randint(0, 255, (256, 256, 3))
    img[128:384, 128:384, 3] = 255
    image = Image.fromarray(img)

    dec = pipe.vae.volume_decoder

    def run_latents(seed):
        lat = pipe(image=image, num_inference_steps=5, guidance_scale=5.0,
                   output_type="latents", seed=seed)
        # scalar read: a hard completion barrier (block_until_ready through
        # the remote-device tunnel does not reliably block)
        np.asarray(lat.ravel()[0])
        return lat

    def run_decode(lat):
        # the production program: latents2mesh's 'mesh' mode — decode →
        # compaction → surface-nets emission, ONE compiled program
        # (models/shapevae.py). Cost is data-independent (static
        # capacities), so timing it on these latents equals a real mesh.
        hidden = sv._decode_latents_jit(pipe.vae.params, pipe.vae.cfg, lat)
        kv = sv._compute_kv_jit(pipe.vae.params, pipe.vae.cfg, hidden)
        out = sv._grid_decode_jit(
            pipe.vae.params, pipe.vae.cfg, kv, "flashvdm", octree, num_chunks,
            1.01, 0.0, dec.block, dec.capacity_frac, dec.coarse_factor,
            "mesh", getattr(dec, "topk_mode", "mean"))
        np.asarray(out[3])          # count: completion barrier
        return out

    # surface stage fixture: analytic sphere at the same 385³ resolution,
    # resident ON DEVICE like the real decode output (random weights would
    # give a noise SDF with pathological active-cell counts)
    import functools

    import numpy as np

    from hunyuan3d2_tpu.models.shapevae import active_capacity, face_capacity
    from hunyuan3d2_tpu.volume.decoders import (
        bucket_slice,
        extract_active_cells,
        quads_to_tris,
        surface_nets_from_grid,
    )
    from hunyuan3d2_tpu.volume.surface import Latent2MeshOutput

    sphere_dev = None if surf_reuse else build_sphere_device(octree)
    if sphere_dev is not None:
        log(f"sphere fixture built at t={time.perf_counter() - T0:.1f}s")
    cap = active_capacity(octree)
    fcap = face_capacity(octree)
    # the production path (latents2mesh 'mesh' mode): fused compaction +
    # surface-nets emission in one program, bucketed host transfer
    sn_fused = jax.jit(functools.partial(surface_nets_from_grid,
                                         level=0.0, box_v=1.01, capacity=cap,
                                         face_capacity=fcap))
    extract = jax.jit(functools.partial(extract_active_cells,
                                        level=0.0, capacity=cap))
    extractor = SurfaceNetsExtractor()

    def run_surface(verbose=False):
        """Sphere-fixture mesh for the paint stages. The EMISSION cost is
        already counted inside run_decode's one-program 'mesh' mode (static
        capacities ⇒ data-independent cost), so only the host TRANSFER is
        timed here; the emission below exists to hand paint a real mesh
        (random weights decode to a noise SDF). Returns (mesh, transfer_s)."""
        t0 = time.perf_counter()
        verts, quads, nq, count, ok = sn_fused(sphere_dev)
        n, nq_i, ok = int(count), int(nq), bool(ok)
        t1 = time.perf_counter()
        if not ok:  # capacity overflow → host assembly fallback
            cell_flat, vals, count = extract(sphere_dev)
            r = extractor.from_actives(cell_flat, vals, int(count),
                                       octree + 1, 0.0, 1.01)
            if verbose:
                log(f"  surface sub (host fallback): n={n} nq={nq_i}")
            return r, time.perf_counter() - t0
        v_host = bucket_slice(verts, n).astype(np.float32)
        f_host = quads_to_tris(bucket_slice(quads, nq_i)).astype(np.int32)
        r = Latent2MeshOutput(v_host, f_host)
        t2 = time.perf_counter()
        if verbose:
            log(f"  surface sub: sphere emit+fetch {t1 - t0:.2f}s (untimed) "
                f"slice+transfer {t2 - t1:.2f}s "
                f"({n} verts, {2 * nq_i} tris)")
        return r, t2 - t1

    # warmup (compiles; persistent cache makes re-runs cheap). Host allocator
    # arenas first-touch at ~100 MB/s on this host → run surface twice.
    with stage_guard(min(1200, remaining() - reserve), "shape warmup"):
        lat = run_latents(0)
        log(f"warmup latents done at t={time.perf_counter() - T0:.1f}s")
        run_decode(lat)
        log(f"warmup decode done at t={time.perf_counter() - T0:.1f}s")
        if not surf_reuse:
            run_surface(verbose=True)
            run_surface(verbose=True)
            log(f"warmup surface done at t={time.perf_counter() - T0:.1f}s")

    n_runs = 3
    t_lat, t_dec, t_surf = [], [], []
    out = None
    with stage_guard(min(600, remaining() - reserve // 2), "shape measure"):
        for i in range(n_runs):
            t0 = time.perf_counter()
            lat = run_latents(i + 1)
            t_lat.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_decode(lat)
            t_dec.append(time.perf_counter() - t0)
        if surf_reuse:
            out, t_surf = surf_reuse[0], [surf_reuse[1]]
        else:
            for i in range(n_runs):
                out, transfer_s = run_surface()
                t_surf.append(transfer_s)
    assert out is not None and len(out.mesh_v) > 0

    lat_sec, dec_sec, surf_sec = median(t_lat), median(t_dec), median(t_surf)
    shape_sec = lat_sec + dec_sec + surf_sec
    log(f"shape done: {shape_sec:.2f}s (cond+dit {lat_sec:.2f} "
        f"decode+mesh {dec_sec:.2f} transfer {surf_sec:.2f})")

    # ---- MFU, analytic (VERDICT r2 #3) --------------------------------------
    # XLA's compiled cost_analysis() counts each lax.scan BODY once (not x
    # trip count), undercounting every scanned program here by 5-15x, so the
    # FLOPs are counted analytically: 2*params*tokens matmul work + 4*T^2*d*L
    # attention (exact for the linear terms; ~10% envelope overall).
    mfu = {}
    try:
        with stage_guard(120, "mfu accounting"):
            ci = pipe.prepare_image(image)
            cond = pipe.encode_cond(ci["image"], True)

            def n_params(tree):
                return sum(int(x.size) for x in jax.tree.leaves(tree))

            # 5-step CFG DiT: batch 2, joint sequence latents+cond tokens
            mcfg = pipe.model_cfg
            T = pipe.vae.cfg.num_latents + cond.shape[1]
            n_attn = mcfg.depth + mcfg.depth_single_blocks
            dit_flops = 5 * 2 * (2 * n_params(pipe.model_params) * T
                                 + 4 * T * T * mcfg.hidden_size * n_attn)
            # DINOv2-giant encode: one pass over 1370 tokens (uncond is a
            # zeros tensor, not an encode - conditioner.py)
            enc = pipe.conditioner.main
            dcfg = enc.cfg.dino
            Td = dcfg.seq_len
            dino_flops = (2 * n_params(enc.params) * Td
                          + 4 * Td * Td * dcfg.hidden_size * dcfg.num_layers)
            window = dit_flops + dino_flops
            mfu["dit_denoise_tflops"] = round(dit_flops / 1e12, 2)
            mfu["dino_encode_tflops"] = round(dino_flops / 1e12, 2)
            mfu["mfu_cond_dit"] = round(window / lat_sec / PEAK_BF16, 4)

            # block-sparse volume decode: (padded coarse pass + top-k fine
            # blocks) x per-query geo-decoder cost
            vcfg = pipe.vae.cfg
            g = pipe.vae.params["geo_decoder"]
            lin = sum(int(g[k]["w"].size) for k in
                      ("query_proj", "c_q", "c_proj", "mlp_fc", "mlp_proj",
                       "output_proj") if k in g)
            per_q = 2 * lin + 4 * vcfg.num_latents * vcfg.width
            nb = -(-(octree + 1) // dec.block)
            ncp = nb * dec.coarse_factor + 1
            chunk = min(num_chunks, ncp ** 3)
            coarse_q = -(-ncp ** 3 // chunk) * chunk       # incl. padding
            fine_q = max(1, min(int(nb ** 3 * dec.capacity_frac),
                                nb ** 3)) * dec.block ** 3
            dec_flops = (coarse_q + fine_q) * per_q
            mfu["volume_decode_tflops"] = round(dec_flops / 1e12, 2)
            mfu["volume_decode_queries_m"] = round(
                (coarse_q + fine_q) / 1e6, 2)
            # denominator: the one-program decode+mesh wall; the numerator
            # is decode FLOPs only, so this slightly UNDERSTATES decode MFU
            # (surface-nets emission time is in the denominator)
            mfu["mfu_volume_decode"] = round(
                dec_flops / dec_sec / PEAK_BF16, 4)
    except Exception as e:  # pragma: no cover
        log(f"mfu accounting skipped: {e!r}")

    record = {
        "metric": metric,
        "value": round(shape_sec, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / shape_sec, 3),
        "cond_dit_sec": round(lat_sec, 4),
        # latents2mesh 'mesh' mode: decode + compaction + surface-nets
        # emission, one program, measured on the real latents (static
        # capacities ⇒ data-independent cost)
        "decode_mesh_sec": round(dec_sec, 4),
        # bucketed host transfer of the mesh buffers (sphere fixture)
        "mesh_transfer_sec": round(surf_sec, 4),
        # honest-labeling (VERDICT r2 weak#2): cond/dit/decode+mesh timed on
        # real model outputs; the transferred mesh handed to the paint stage
        # comes from the analytic sphere grid (random weights decode to a
        # noise SDF — see module docstring)
        "composition": "cond+dit+decode+mesh real; transferred mesh from "
                       "sphere fixture"
                       + (" (transfer reused from mini stage — fixture and "
                          "transfer cost depend only on octree)"
                          if surf_reuse else ""),
        "model": size,
        "dit_params_m": round(sum(
            int(x.size) for x in jax.tree.leaves(pipe.model_params)) / 1e6, 1),
        "vae_latents": int(pipe.vae.cfg.num_latents),
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

    # free the shape models' HBM before the paint stack loads (the tunnel's
    # quota does not fit both stages' params + workspaces). Dropping the
    # references frees device memory instantly; offload_to_host would pull
    # ~2.5 GB through the remote tunnel (~19 min, measured — the entire
    # round-2 bench timeout). Production serving uses offload/restore
    # (shapegen.py:202-225); the bench never reuses the shape stack.
    pipe.model_params = None
    pipe.vae.params = None
    pipe.conditioner.main.params = None
    import gc

    gc.collect()
    paint = Hunyuan3DPaintPipeline.init_random(
        jax.random.PRNGKey(1), size=PAINT_SIZE, view_size=VIEW,
        render_size=RENDER, texture_size=TEXTURE, num_inference_steps=10)
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

    # drop any window recorded by the warmup run: if the measured run falls
    # back to the host path, a stale device window must read as "absent",
    # not as this run's denominator
    from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS

    LAST_TIMINGS.pop("Diffusion Window (device)", None)
    # median of 3 like the shape stages: a single paint run fluctuated
    # 4.7-5.5 s across driver-grade runs (remote-tunnel dispatch jitter)
    paint_times, tex_mesh = [], None
    with stage_guard(min(600, remaining() - 15), "paint measure"):
        for i in range(3):
            t0 = time.perf_counter()
            tex_mesh = paint(m, image)
            paint_times.append(time.perf_counter() - t0)
            if remaining() < 120:
                break
    assert tex_mesh is not None
    paint_sec = median(paint_times)
    log(f"paint done: {paint_sec:.2f}s (runs: "
        + ", ".join(f"{t:.2f}" for t in paint_times) + ")")
    # per-scope split of the LAST measured run (device path scopes:
    # cond maps / diffusion dispatch+window / UV unwrap overlap / bake
    # geometry / texture bake / inpaint) — the paint_sec denominators
    log("paint scopes: " + ", ".join(
        f"{k}={v:.2f}s" for k, v in LAST_TIMINGS.items()))

    # ---- 2.5D UNet / diffusion-stage MFU (VERDICT r2 #3) --------------------
    # FLOPs counted analytically (paint_unet.apply_flops / sd_vae.flops —
    # JAX 0.9's un-compiled lower().cost_analysis() returns None, and a
    # compiled one would compile the full UNet just for the metric; the
    # analytic walk is validated vs XLA's compiled cost model in
    # tests/test_flops.py), times the step count; the denominator is the
    # measured dispatch→ready wall window of the diffusion stage recorded by
    # texgen (includes the part overlapped by the host UV unwrap).
    mfu = {}
    try:
        with stage_guard(min(120, max(1, remaining() - 10)), "paint mfu"):
            from hunyuan3d2_tpu.models import paint_unet, sd_vae
            from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS

            mv = paint.models["multiview_model"].pipeline
            ucfg, vcfg = mv.unet_cfg, mv.vae_cfg
            # the turbo LCM path caps at the reference's 10-step schedule
            n_steps = min(getattr(
                paint.models["multiview_model"], "num_inference_steps", 10), 10)
            b, n_gen, n_ref = 1, 6, 1
            hw = mv.view_size // 8
            step_f, build_f = paint_unet.apply_flops(ucfg, hw, hw, n_gen,
                                                     n_ref, b)
            enc_f = sd_vae.flops(vcfg, mv.view_size, mv.view_size, 1,
                                 "encode")
            dec_f = sd_vae.flops(vcfg, hw, hw, 1, "decode")
            # 2*n_gen control encodes + n_ref reference encode; n_gen decodes
            total = (build_f + n_steps * step_f
                     + (2 * n_gen + n_ref) * enc_f + n_gen * dec_f)
            window = LAST_TIMINGS.get("Diffusion Window (device)")
            mfu["unet_step_tflops"] = round(step_f / 1e12, 2)
            mfu["paint_diffusion_tflops"] = round(total / 1e12, 2)
            if window:
                mfu["paint_diffusion_window_sec"] = round(window, 4)
                mfu["mfu_paint_diffusion"] = round(
                    total / window / PEAK_BF16, 4)
    except Exception as e:  # pragma: no cover
        log(f"paint mfu accounting skipped: {e!r}")

    return {"postprocess_sec": round(postprocess_sec, 4),
            "paint_sec": round(paint_sec, 4), **mfu}, paint


def single_pass_stage(paint, image):
    """One true single-process, single-mesh pass (VERDICT r3 #3): image →
    shape → postprocess → paint → GLB with NO fixture substitution. Random
    weights decode to a noise SDF; the block-sparse decoder caps actives at
    capacity, so the noise mesh is a cost *upper bound* for a real mesh.

    All programs are warm from the earlier stages (identical shapes). The
    shape stack is re-materialized on device before t0 (model residency =
    serving startup, untimed, same as the reference api_server preloading
    models); the shape→paint parameter swap IS timed (recorded separately as
    swap_sec) because this chip's HBM quota cannot hold both stacks — on
    production hardware this is a host↔device transfer of the same order."""
    import gc
    import tempfile

    import jax

    from hunyuan3d2_tpu.geometry.postprocess import (
        DegenerateFaceRemover,
        FaceReducer,
        FloaterRemover,
    )
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
    from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

    # free paint HBM, bring the shape stack up (untimed: serving startup)
    paint.models["multiview_model"].pipeline.unet_params = None
    paint.models["multiview_model"].pipeline.vae_params = None
    gc.collect()
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size=SHAPE_SIZE, dino=DINO)
    pipe.enable_flashvdm(True, mc_algo="dmc")
    # random weights decode a noise SDF with ~99% of cells active; cap at
    # the decoder's 6R² budget (the record's stated semantics) instead of
    # falling through to the exact-but-dense 385³ host path, which spends
    # minutes meshing throwaway noise (r4 first run: 125 s shape stage)
    os.environ["HY3D_CAP_ACTIVES"] = "1"
    log(f"single-pass: shape stack up at t={time.perf_counter() - T0:.1f}s")

    def one_pass(seed, verbose):
        """One COMPLETE image→GLB pass on one mesh. Expects the shape stack
        resident; leaves the paint stack resident (returned for teardown)."""
        t0 = time.perf_counter()
        mesh = pipe(image=image, num_inference_steps=5, guidance_scale=5.0,
                    octree_resolution=OCTREE, num_chunks=NUM_CHUNKS,
                    mc_algo="dmc", seed=seed)
        if isinstance(mesh, list):
            mesh = mesh[0]
        assert mesh is not None, "single-pass decode produced no mesh"
        t_shape = time.perf_counter() - t0
        if verbose:
            from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS

            log("single-pass shape scopes: " + ", ".join(
                f"{k}={v:.2f}s" for k, v in LAST_TIMINGS.items()
                if k in ("Preprocess", "Encode Cond", "Diffusion Sampling",
                         "Volume Decoding")))
        m = FloaterRemover()(mesh)
        m = DegenerateFaceRemover()(m)
        m = FaceReducer()(m, max_facenum=40000)
        t_post = time.perf_counter() - t0 - t_shape

        t_swap0 = time.perf_counter()
        pipe.model_params = None
        pipe.vae.params = None
        pipe.conditioner.main.params = None
        gc.collect()
        p2 = Hunyuan3DPaintPipeline.init_random(
            jax.random.PRNGKey(1), size=PAINT_SIZE, view_size=VIEW,
            render_size=RENDER, texture_size=TEXTURE, num_inference_steps=10)
        p2.models["multiview_model"].pipeline.set_turbo(True)
        t_swap = time.perf_counter() - t_swap0

        tex_mesh = p2(m, image)
        with tempfile.NamedTemporaryFile(suffix=".glb", delete=True) as fh:
            tex_mesh.export(fh.name)
        total = time.perf_counter() - t0
        log(f"single-pass done: {total:.2f}s (shape {t_shape:.2f} post "
            f"{t_post:.2f} swap {t_swap:.2f} paint+glb "
            f"{total - t_shape - t_post - t_swap:.2f})")
        return total, {
            "shape_sec": round(t_shape, 4),
            "postprocess_sec": round(t_post, 4),
            "param_swap_sec": round(t_swap, 4),
            "paint_glb_sec": round(total - t_shape - t_post - t_swap, 4),
            "mesh_faces": int(len(m.faces)),
        }, p2

    # median of up to 3 complete passes: the remote tunnel's dispatch
    # latency varies run-to-run by ±20% (observed 8.4-10.0 s for identical
    # code); every pass is a full image→GLB on its own mesh (fresh seed).
    # The inter-pass stack swap (paint down, shape up) is serving startup —
    # untimed, exactly like the first pass's.
    runs, parts = [], None
    for i in range(3):
        total, p, paint2 = one_pass(7 + i, verbose=(i == 0))
        runs.append(round(total, 4))
        if parts is None or total == median(runs):
            parts = p
        if remaining() < 2.0 * total + 90 or i == 2:
            break
        # teardown: paint stack down, shape stack back up (untimed)
        paint2.models["multiview_model"].pipeline.unet_params = None
        paint2.models["multiview_model"].pipeline.vae_params = None
        gc.collect()
        pipe2 = Hunyuan3DDiTFlowMatchingPipeline.init_random(
            jax.random.PRNGKey(0), size=SHAPE_SIZE, dino=DINO)
        pipe2.enable_flashvdm(True, mc_algo="dmc")
        pipe.model_params = pipe2.model_params
        pipe.vae.params = pipe2.vae.params
        pipe.conditioner.main.params = pipe2.conditioner.main.params
        del pipe2
        log(f"single-pass: shape stack back up at "
            f"t={time.perf_counter() - T0:.1f}s")
    total = median(runs)
    return {
        "metric": "image_to_textured_glb_single_pass_sec",
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / total, 3),
        "composition": "single-pass",
        "runs": runs,
        **parts,
        "note": "noise-SDF mesh from random weights (zero-egress); "
                "actives capped at decoder capacity — cost upper bound; "
                "value = median of complete passes",
    }, paint2


def standard_stage(paint_resident, image, out, transfer_sec, postprocess_sec):
    """Reference STANDARD-path record (VERDICT r4 #5): 50-step shape sampling
    (pipelines.py:684-693 default num_inference_steps=50) + 30-step
    EulerAncestral paint (multiview_utils.py:92 default). Stage-sum like the
    turbo headline: cond+dit(50)+decode measured on real model outputs,
    surface transfer + postprocess reused (octree/mesh-size-dependent only),
    paint(30, EulerAncestral) measured on the fixture mesh."""
    import gc

    import jax
    import numpy as np

    from hunyuan3d2_tpu.geometry.mesh import Mesh
    from hunyuan3d2_tpu.geometry.postprocess import (
        DegenerateFaceRemover,
        FaceReducer,
        FloaterRemover,
    )
    from hunyuan3d2_tpu.models import shapevae as sv
    from hunyuan3d2_tpu.pipelines.shapegen import Hunyuan3DDiTFlowMatchingPipeline
    from hunyuan3d2_tpu.pipelines.texgen import Hunyuan3DPaintPipeline

    # paint stack down, shape stack up (untimed: serving startup)
    paint_resident.models["multiview_model"].pipeline.unet_params = None
    paint_resident.models["multiview_model"].pipeline.vae_params = None
    gc.collect()
    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size=SHAPE_SIZE, dino=DINO)
    pipe.enable_flashvdm(True, mc_algo="dmc")
    dec = pipe.vae.volume_decoder
    log(f"standard: shape stack up at t={time.perf_counter() - T0:.1f}s")

    steps = 5 if SMOKE else 50

    def run50(seed):
        lat = pipe(image=image, num_inference_steps=steps, guidance_scale=5.5,
                   output_type="latents", seed=seed)
        np.asarray(lat.ravel()[0])
        return lat

    def run_decode(lat):
        hidden = sv._decode_latents_jit(pipe.vae.params, pipe.vae.cfg, lat)
        kv = sv._compute_kv_jit(pipe.vae.params, pipe.vae.cfg, hidden)
        o = sv._grid_decode_jit(
            pipe.vae.params, pipe.vae.cfg, kv, "flashvdm", OCTREE, NUM_CHUNKS,
            1.01, 0.0, dec.block, dec.capacity_frac, dec.coarse_factor,
            "mesh", getattr(dec, "topk_mode", "mean"))
        np.asarray(o[3])

    with stage_guard(min(900, remaining() - 240), "standard shape"):
        lat = run50(0)   # compiles the 50-step scan; decode program is warm
        run_decode(lat)
        log(f"standard: warmup done at t={time.perf_counter() - T0:.1f}s")
        t_lat, t_dec = [], []
        for i in range(3):
            t0 = time.perf_counter()
            lat = run50(i + 1)
            t_lat.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_decode(lat)
            t_dec.append(time.perf_counter() - t0)
    lat_sec, dec_sec = median(t_lat), median(t_dec)
    shape_sec = lat_sec + dec_sec + transfer_sec
    log(f"standard shape done: {shape_sec:.2f}s (cond+dit50 {lat_sec:.2f} "
        f"decode+mesh {dec_sec:.2f})")

    # shape stack down, standard (EulerAncestral, 30-step) paint stack up
    pipe.model_params = None
    pipe.vae.params = None
    pipe.conditioner.main.params = None
    gc.collect()
    paint = Hunyuan3DPaintPipeline.init_random(
        jax.random.PRNGKey(1), size=PAINT_SIZE, view_size=VIEW,
        render_size=RENDER, texture_size=TEXTURE,
        num_inference_steps=3 if SMOKE else 30)
    log(f"standard: paint stack up at t={time.perf_counter() - T0:.1f}s")
    m = FloaterRemover()(Mesh(out.mesh_v, out.mesh_f))
    m = DegenerateFaceRemover()(m)
    m = FaceReducer()(m, max_facenum=40000)

    paint_times = []
    with stage_guard(remaining() - 30, "standard paint"):
        paint(m, image)  # warmup (compiles the 30-step EA scan)
        log(f"standard: paint warmup done at t={time.perf_counter() - T0:.1f}s")
        for i in range(3):
            t0 = time.perf_counter()
            tex_mesh = paint(m, image)
            paint_times.append(time.perf_counter() - t0)
            if remaining() < 120:
                break
    paint_sec = median(paint_times)
    log(f"standard paint done: {paint_sec:.2f}s (runs: "
        + ", ".join(f"{t:.2f}" for t in paint_times) + ")")

    total = shape_sec + postprocess_sec + paint_sec
    return {
        "metric": "image_to_textured_glb_e2e_sec_standard",
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / total, 3),
        "shape_steps": steps,
        "paint_steps": 3 if SMOKE else 30,
        "paint_scheduler": "euler_ancestral",
        "cond_dit_sec": round(lat_sec, 4),
        "decode_mesh_sec": round(dec_sec, 4),
        "mesh_transfer_sec": round(transfer_sec, 4),
        "postprocess_sec": round(postprocess_sec, 4),
        "paint_sec": round(paint_sec, 4),
        "composition": "cond+dit+decode real; surface/postprocess/paint on "
                       "the sphere-fixture mesh (stage-sum, not one pass)",
    }


def main():
    _install_sigterm_flush()
    if not preflight():
        _emergency_exit("TPU backend unavailable after preflight retries")

    import hunyuan3d2_tpu  # noqa: F401 — configures the persistent compile cache

    log_cache_state("start")
    record, pipe, out, image = shape_stage()
    log_cache_state("after shape")
    # print the shape milestone NOW — a texture blowup can't zero the round
    emit(record)

    # ---- v2-0 flagship shape record (VERDICT r4 #1) -------------------------
    # FULL 1.1B DiT + 3072-latent ShapeVAE — the reference default config
    # (pipelines.py:470-485) — same 5-step turbo + FlashVDM 'mean' schedule.
    # Budget-gated and best-effort: the turbo e2e headline stands regardless.
    v20_size = "tiny" if SMOKE else "full"
    if remaining() > 1100 or SMOKE:
        try:
            # this chip's HBM cannot hold both stacks: drop the mini params
            # (the texture stage re-derives nothing from them; `out` is the
            # already-transferred fixture mesh)
            import gc

            pipe.model_params = None
            pipe.vae.params = None
            pipe.conditioner.main.params = None
            gc.collect()
            v20, pipe, _, _ = shape_stage(
                size=v20_size,
                metric=f"shape_gen_e2e_sec_v20_5step_octree{OCTREE}",
                surf_reuse=(out, record["mesh_transfer_sec"]),
                reserve=720 if not SMOKE else 60)
            emit(v20, best=False)
            log_cache_state("after v20 shape")
        except Exception:
            import traceback

            traceback.print_exc(file=sys.stderr)
            log("v20 shape stage failed — continuing with the texture stage")
    else:
        log(f"skipping v20 shape stage: {remaining():.0f}s left of budget")

    if remaining() < 240:
        log(f"skipping texture stage: {remaining():.0f}s left of budget")
        return
    tex, paint = texture_stage(pipe, out, image)
    texture_sec = tex["postprocess_sec"] + tex["paint_sec"]
    total = record["value"] + texture_sec
    full = {
        "metric": "image_to_textured_glb_e2e_sec_turbo",
        "paint_steps": 10,
        "value": round(total, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / total, 3),
        "shape_sec": record["value"],
        "texture_sec": round(texture_sec, 4),
        "composition": "cond+dit+decode real; surface/postprocess/paint/bake "
                       "on the sphere-fixture mesh (stage-sum, not one pass)",
        **{k: v for k, v in record.items()
           if k not in ("metric", "value", "unit", "vs_baseline")},
        **tex,
    }
    emit(full)

    # one true single-pass run (VERDICT r3 #3); best-effort — the stage-sum
    # record above stands regardless
    paint_resident = paint
    if remaining() > 300:
        try:
            with stage_guard(remaining() - 30, "single pass"):
                sp, paint_resident = single_pass_stage(paint, image)
            emit(sp, best=False)
            full = dict(full)
            full["single_pass_sec"] = sp["value"]
            full["single_pass_param_swap_sec"] = sp["param_swap_sec"]
            emit(full)  # re-print the headline as the authoritative last line
        except Exception:
            import traceback

            traceback.print_exc(file=sys.stderr)
            emit(full)  # keep the headline the last line
    else:
        log(f"skipping single-pass: {remaining():.0f}s left of budget")

    # reference STANDARD path (50-step shape + 30-step EulerAncestral paint,
    # VERDICT r4 #5); best-effort — the turbo headline stands regardless
    if remaining() > 700 or SMOKE:
        try:
            std = standard_stage(paint_resident, image, out,
                                 record["mesh_transfer_sec"],
                                 tex["postprocess_sec"])
            emit(std, best=False)
            emit(full)  # keep the turbo headline the authoritative last line
        except Exception:
            import traceback

            traceback.print_exc(file=sys.stderr)
            emit(full)
    else:
        log(f"skipping standard-path stage: {remaining():.0f}s of budget")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        import traceback

        print(traceback.format_exc(), file=sys.stderr, flush=True)
        # format_exception_only yields the "SomeError: msg" line — the raw
        # traceback's last line can be JAX's frame-filtering notice instead
        reason = "".join(
            traceback.format_exception_only(type(e), e)).strip()
        # first line = "SomeError: <first message line>"
        _emergency_exit(reason.splitlines()[0] if reason else repr(e))
