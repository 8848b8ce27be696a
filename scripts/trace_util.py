"""Trace-based timing helpers for the remote-TPU (axon) stack.

``jax.block_until_ready`` does NOT reliably block through the axon tunnel
(measured: a chain of ten 8192^3 matmuls "completed" in 0.03 ms wall).
Truthful timing needs either a real download (``sync``, what bench.py's
timed scopes do) or the device trace (``trace_top_ops``).
"""
import glob
import gzip
import json
import shutil
from collections import defaultdict

import jax
import numpy as np


def sync(x):
    """Force execution by downloading one element (pytree-aware)."""
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[0])


def trace_top_ops(fn, tdir="/tmp/jax_trace_util", top=25, min_ms=0.05):
    """Run fn() under the profiler; return [(name, total_ms)] of device ops
    sorted by total duration, excluding host-side wrapper events."""
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        sync(fn())
    tot = defaultdict(float)
    for fpath in glob.glob(tdir + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(fpath, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                name = ev.get("name", "?")
                if name.startswith("$") or "trace" in name:
                    continue
                tot[name] += ev["dur"] / 1e3
    rows = sorted(tot.items(), key=lambda kv: -kv[1])
    return [(n, ms) for n, ms in rows[:top] if ms >= min_ms]


def print_top(rows, title=""):
    if title:
        print(f"== {title}", flush=True)
    for nm, ms in rows:
        print(f"  {ms:8.2f} ms  {nm[:84]}", flush=True)
