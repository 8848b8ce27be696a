"""Run every example script end-to-end as an integration test.

The reference has no test suite — its examples ARE the de-facto integration
suite (SURVEY.md §4.1: reference examples/*.py pin seeds and exact configs
and export a GLB). We mirror that: each of our examples supports
``HY3D_RANDOM_WEIGHTS=1`` (tiny random-weight pipelines, CPU-runnable) and
must still produce a real, loadable artifact. A broken example can't ship.

In-process ``runpy`` (not a subprocess) so all examples share one jit cache —
most use the same tiny pipeline shapes, so the suite compiles each program
once instead of 12 times.
"""

import os
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

# script → artifact paths (relative to the script's working directory unless
# absolute). text_to_3d writes to REPO/tmp/results regardless of cwd.
CASES = {
    "shape_gen.py": ["shape_gen.glb"],
    "shape_gen_mini.py": ["demo_mini.glb"],
    "shape_gen_mv.py": ["shape_gen_mv.glb"],
    "shape_gen_multiview.py": ["demo_mv.glb"],
    "fast_shape_gen_with_flashvdm.py": ["fast_shape_gen.glb"],
    "fast_shape_gen_multiview.py": ["demo_mv3.glb"],
    "faster_shape_gen_with_flashvdm_mini_turbo.py": [
        "tmp/results/run_0.glb", "tmp/results/run_1.glb"],
    "fast_texture_gen_multiview.py": ["fast_texture_gen.glb"],
    "text_to_3d.py": [os.path.join(REPO, "tmp", "results", "text_to_3d.glb")],
    "textured_shape_gen.py": ["textured_shape_gen.glb"],
    "textured_shape_gen_mini.py": ["demo_mini.glb", "demo_textured_mini.glb"],
    "textured_shape_gen_multiview.py": [
        "demo_white_mesh_mv.glb", "demo_textured_mv.glb"],
}


def test_every_example_is_covered():
    on_disk = {f for f in os.listdir(EXAMPLES) if f.endswith(".py")}
    assert on_disk == set(CASES), (
        f"examples drifted: untested {on_disk - set(CASES)}, "
        f"stale cases {set(CASES) - on_disk}")


@pytest.mark.slow
@pytest.mark.parametrize("script", sorted(CASES))
def test_example_runs_and_exports(script, tmp_path, monkeypatch):
    from hunyuan3d2_tpu.geometry.mesh import Mesh

    artifacts = [a if os.path.isabs(a) else str(tmp_path / a)
                 for a in CASES[script]]
    for a in artifacts:
        if os.path.exists(a):
            os.remove(a)

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HY3D_RANDOM_WEIGHTS", "1")
    monkeypatch.setattr(sys, "argv", [os.path.join(EXAMPLES, script)])
    runpy.run_path(os.path.join(EXAMPLES, script), run_name="__main__")

    for a in artifacts:
        assert os.path.exists(a), f"{script}: missing artifact {a}"
        assert os.path.getsize(a) > 100, f"{script}: empty artifact {a}"
        mesh = Mesh.load(a)
        assert len(mesh.vertices) > 0 and len(mesh.faces) > 0, (
            f"{script}: artifact {a} loaded empty")
