"""Profile one full-config paint-UNet denoise step on the real TPU and
print the top device ops by total time (parsed from the jax.profiler trace).

Run: python scripts/profile_paint_step.py  (needs the axon TPU)
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.models import paint_unet


def main():
    cfg = paint_unet.DEFAULT
    key = jax.random.PRNGKey(0)
    params = jax.jit(paint_unet.init, static_argnums=1)(key, cfg)
    n_gen, n_ref, b = 6, 1, 1
    hw = 64
    ch4 = 4
    sample = jax.random.normal(key, (b, n_gen, hw, hw, ch4), jnp.bfloat16)
    nrm = jax.random.normal(key, (b, n_gen, hw, hw, ch4), jnp.bfloat16)
    pos = jax.random.normal(key, (b, n_gen, hw, hw, ch4), jnp.bfloat16)
    ref = jax.random.normal(key, (b, n_ref, hw, hw, ch4), jnp.bfloat16)
    t = jnp.full((b * n_gen,), 500, jnp.int32)
    cam = jnp.zeros((b, n_gen), jnp.int32)
    camr = jnp.zeros((b, n_ref), jnp.int32)

    @jax.jit
    def step(params, sample):
        out, _ = paint_unet.apply(params, cfg, sample, t, nrm, pos, ref,
                                  cam, camr)
        return out

    out = step(params, sample)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out = step(params, sample)
    out.block_until_ready()
    wall = (time.perf_counter() - t0) / 3
    print(f"step wall: {wall*1000:.1f} ms")

    tdir = "/tmp/paint_trace"
    with jax.profiler.trace(tdir):
        out = step(params, sample)
        out.block_until_ready()

    # parse the trace: sum device-op durations by name
    files = glob.glob(tdir + "/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace file found"); return
    ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    # device lanes: pid names containing "TPU" / "/device:"
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
            and "args" in e}
    dev_pids = {p for p, n in pids.items()
                if "TPU" in n or "tpu" in n or "Device" in n}
    tot = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0) / 1e3  # ms
    items = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    print(f"device total: {sum(tot.values()):.1f} ms across {len(tot)} ops")
    for name, ms in items:
        print(f"  {ms:8.2f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
