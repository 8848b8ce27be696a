"""Compiled-HLO collective diagnostics.

Parses the optimized HLO of a compiled (sharded) program and tallies the
cross-device collectives by type: instruction count and result bytes. Used by
the driver dryrun (__graft_entry__) to print a per-phase collective summary
and ASSERT sharding efficiency bounds — a regression that, say, all-gathers
the full parameter tree every step changes these numbers by orders of
magnitude and can no longer pass silently (VERDICT r4 #9).

The byte tally is the RESULT footprint of each collective instruction — a
layout-independent proxy for wire traffic (for all-reduce the ring moves
~2× the buffer; for all-gather the result IS the gathered size, which is the
quantity the efficiency bound cares about).
"""

from __future__ import annotations

import math
import re
from typing import Dict, Tuple

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all", "collective-broadcast")

# `%name = <result type> <op>(` — async ops appear as <op>-start/-done pairs;
# only the -start (or the sync form) carries the transfer, so -done is
# skipped to avoid double counting.
_INSTR_RE = re.compile(
    r"=\s*([^=]*?)\s+(" + "|".join(_COLLECTIVES) + r")(-start)?\(")

_SHAPE_RE = re.compile(r"(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _shape_bytes(result_type: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(result_type):
        n = math.prod(int(d) for d in dims.split(",") if d) if dims else 1
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_stats(hlo_text: str) -> Dict[str, Tuple[int, int]]:
    """{collective type: (instruction count, summed result bytes)} over the
    optimized-HLO text of a compiled program (``compiled.as_text()``)."""
    stats: Dict[str, Tuple[int, int]] = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.search(line)
        if not m:
            continue
        if f"{m.group(2)}-done" in line:
            continue
        result_type, op = m.group(1), m.group(2)
        cnt, byt = stats.get(op, (0, 0))
        stats[op] = (cnt + 1, byt + _shape_bytes(result_type))
    return stats


def format_stats(stats: Dict[str, Tuple[int, int]]) -> str:
    if not stats:
        return "no collectives"
    return ", ".join(f"{op} n={cnt} {byt / 1e6:.2f}MB"
                     for op, (cnt, byt) in sorted(stats.items()))


def compiled_collective_stats(jitted_fn, *args, **kwargs):
    """Lower+compile ``jitted_fn`` on ``args`` (under the active mesh) and
    return its collective stats. The compile hits the persistent cache when
    the same program was just executed."""
    compiled = jitted_fn.lower(*args, **kwargs).compile()
    return collective_stats(compiled.as_text())


def assert_no_full_param_gather(stats, param_bytes: int, tag: str,
                                frac: float = 0.75) -> None:
    """Efficiency bound: the per-step all-gather volume must stay well below
    the full parameter footprint — tensor-parallel params are supposed to
    STAY sharded (activations move, weights don't). A broken sharding rule
    that re-gathers the tree shows up as all-gather bytes ≥ param bytes."""
    cnt, byt = stats.get("all-gather", (0, 0))
    assert byt < frac * param_bytes, (
        f"{tag}: all-gather volume {byt / 1e6:.1f}MB ≥ {frac:.0%} of the "
        f"param footprint {param_bytes / 1e6:.1f}MB — params are being "
        f"re-gathered ({cnt} instructions)")
