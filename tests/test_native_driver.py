"""Standalone C++ inference driver (native/standalone/hy3d_infer) — the
counterpart of the reference's ggml runtime (project/ggml/main.cpp →
image3d_shape.cpp): checkpoint → mesh with zero Python on the inference path.

The test exports a tiny random pipeline to the flat weight format, runs the
binary on a PPM with fixed initial latents, and checks its per-stage golden
stats against the JAX path (the reference's own cross-runtime methodology,
SURVEY.md §4.2)."""

import os
import re
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = os.path.join(REPO, "hunyuan3d2_tpu", "native", "standalone", "hy3d_infer")


def _build():
    subprocess.run(["make", "-C", os.path.dirname(BIN)], check=True,
                   capture_output=True)


def _parse_stats(stdout: str) -> dict:
    out = {}
    for m in re.finditer(
            r"\[stats\] (\S+)\s+\[[\d,]+\] min: (\S+) max: (\S+) mean: (\S+)",
            stdout):
        out[m.group(1)] = tuple(float(m.group(i)) for i in (2, 3, 4))
    return out


@pytest.mark.filterwarnings("ignore")
def test_standalone_driver_matches_jax_golden_stats(tmp_path):
    _build()
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from export_native import export_pipeline

    from hunyuan3d2_tpu.pipelines.shapegen import (
        Hunyuan3DDiTFlowMatchingPipeline,
        _sample_loop,
    )

    pipe = Hunyuan3DDiTFlowMatchingPipeline.init_random(
        jax.random.PRNGKey(0), size="tiny", dino="tiny")
    wfile = str(tmp_path / "model.hy3dw")
    export_pipeline(pipe, wfile)

    im = np.full((512, 512, 3), 255, np.uint8)
    im[100:412, 100:412] = [90, 120, 220]
    ppm = str(tmp_path / "in.ppm")
    with open(ppm, "wb") as fh:
        fh.write(b"P6\n512 512\n255\n")
        fh.write(im.tobytes())
    lat = np.asarray(pipe.prepare_latents(1, jax.random.PRNGKey(7)))[0]
    latf = str(tmp_path / "init.f32")
    lat.astype(np.float32).tofile(latf)
    obj = str(tmp_path / "mesh.obj")

    r = subprocess.run(
        [BIN, "--weights", wfile, "--image", ppm, "--latents", latf,
         "--steps", "3", "--guidance", "5.0", "--octree", "32",
         "--output", obj],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    stats = _parse_stats(r.stdout)
    assert {"pixels", "cond", "latents", "vae_hidden", "grid_logits"} <= set(stats)

    # JAX reference of the same flow (same initial latents; the image goes
    # through our PIL-based preprocessing — resampling differs slightly, so
    # stats tolerances are loose-but-meaningful, like the reference's golden
    # comments)
    from PIL import Image

    alpha = np.where((im == 255).all(-1, keepdims=True), 0, 255).astype(np.uint8)
    img = Image.fromarray(np.concatenate([im, alpha], axis=-1), "RGBA")
    ci = pipe.prepare_image(img)
    cond = pipe.encode_cond(ci["image"], do_cfg=True)
    sig = jnp.asarray(pipe.scheduler.make_sigmas(3))
    lat2 = _sample_loop(pipe.model_params, pipe.model_cfg,
                        jnp.asarray(lat)[None], cond, sig,
                        jnp.float32(5.0), True, False)
    la = np.asarray(lat2)
    got = stats["latents"]
    assert abs(got[0] - la.min()) < 0.05 and abs(got[1] - la.max()) < 0.05
    assert abs(got[2] - la.mean()) < 0.01

    grid = np.asarray(pipe.vae.decode_grid(jnp.asarray(lat2),
                                           octree_resolution=32,
                                           num_chunks=65536), np.float32)
    gg = stats["grid_logits"]
    assert abs(gg[0] - grid.min()) < 0.1 and abs(gg[1] - grid.max()) < 0.1
    assert abs(gg[2] - grid.mean()) < 0.02

    # mesh artifact: OBJ with verts inside the box
    verts = []
    with open(obj) as fh:
        for line in fh:
            if line.startswith("v "):
                verts.append([float(t) for t in line.split()[1:4]])
            if len(verts) > 5000:
                break
    assert len(verts) > 100
    v = np.asarray(verts)
    assert (np.abs(v) <= 1.02).all()
