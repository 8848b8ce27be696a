"""Test harness config: hermetic CPU runs with a virtual 8-device mesh
(SURVEY.md §4: CPU execution of the mini config is the CI path; sharding is
tested with xla_force_host_platform_device_count=8).

This image preloads JAX with the `axon` TPU PJRT plugin via a sitecustomize
on PYTHONPATH (/root/.axon_site); with that module loaded, selecting the CPU
platform deadlocks during backend discovery. Tests must be hermetic and
multi-device, so if we detect the preloaded plugin we re-exec pytest once in
``pytest_configure`` (after stopping fd capture) with a scrubbed environment:
PYTHONPATH minus the axon site dir, JAX_PLATFORMS=cpu, 8 virtual host devices.
"""

import os
import sys

_GUARD = "_HY3D_TPU_TEST_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_GUARD) == "1":
        return False
    pythonpath = os.environ.get("PYTHONPATH", "")
    return "axon" in pythonpath or os.environ.get("JAX_PLATFORMS", "") != "cpu"


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.stop_global_capturing()
        except Exception:
            pass
    env = dict(os.environ)
    env[_GUARD] = "1"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    )
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *args], env)


os.environ.setdefault("JAX_PLATFORMS", "cpu")
# already-hermetic invocations (PYTHONPATH scrubbed, JAX_PLATFORMS=cpu) skip
# the re-exec above — they must still get the virtual 8-device mesh, or the
# sharding tests silently skip; set it before anything imports jax
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
