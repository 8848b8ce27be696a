"""Framework-native checkpoint save/load (orbax).

The reference only *loads* torch checkpoints (SURVEY.md §5 checkpoint/resume:
inference-only). This adds native round-trip persistence for our param
pytrees — converted checkpoints load in milliseconds from the orbax format
instead of re-mapping torch state dicts on every startup, and training runs
(training/flow_match.py) can checkpoint/resume.
"""

from __future__ import annotations

import os


def save_pytree(path: str, pytree) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, pytree, force=True)
    return path


def load_pytree(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), item=target)
    return ckptr.restore(os.path.abspath(path))
