"""Device-vs-host bake agreement at PRODUCTION sizes (VERDICT r4 #4).

Wraps scripts/verify_bake_production.py as a pytest so the check rides the
suite whenever a real accelerator is visible: 2048² bake raster, 2048²
texture, 512² views, ~44k-face mesh — the reference production config
(texgen/pipelines.py:50-52). On CPU hosts the full size is hours through
the Pallas interpreter, so the test skips (the --small variant of the same
script is covered by tests/test_raster_tpu.py's fixture-size agreement).
"""
import runpy
import sys

import pytest


pytestmark = pytest.mark.slow


def test_production_bake_device_host_agreement(monkeypatch):
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("production-size bake parity needs a real accelerator")
    monkeypatch.setattr(sys, "argv", ["verify_bake_production.py"])
    # the script asserts mean |delta| < 0.03 on mutually-trusted texels
    runpy.run_path("scripts/verify_bake_production.py", run_name="__main__")
