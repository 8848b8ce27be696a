"""Device mesh construction.

The reference is single-GPU (SURVEY.md §2.6: no distributed backend at all);
scaling here is NEW capability designed for TPU pods: a 2-D ``jax.sharding
.Mesh`` with a data axis ("dp" — batches / CFG pairs / multiview stacks /
volume-decode query tiles) and a model axis ("tp" — attention heads & MLP
width of the DiT / UNet). On a single host (v5e-8) both axes ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "tp"),
              dp: Optional[int] = None) -> Mesh:
    """Create a (dp, tp) mesh over the first ``n_devices`` devices.

    Defaults: use all devices; dp = 2 when the device count is even and ≥ 4
    (one CFG pair per dp group), else 1.
    """
    avail = jax.devices()
    if n_devices is not None and len(avail) < n_devices:
        raise RuntimeError(
            f"make_mesh: {n_devices} devices requested but only {len(avail)} "
            f"available ({avail[0].platform}). For virtual multi-device CPU "
            "runs set JAX_PLATFORMS=cpu and XLA_FLAGS="
            "--xla_force_host_platform_device_count=N before importing jax.")
    devices = avail[: n_devices or len(avail)]
    n = len(devices)
    if dp is None:
        dp = 2 if n % 2 == 0 and n >= 4 else 1
    tp = n // dp
    assert dp * tp == n, f"{dp}x{tp} != {n}"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=tuple(axis_names))
