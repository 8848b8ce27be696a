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
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if dp is None:
        dp = 2 if n % 2 == 0 and n >= 4 else 1
    tp = n // dp
    assert dp * tp == n, f"{dp}x{tp} != {n}"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=tuple(axis_names))
