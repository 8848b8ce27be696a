"""Blender addon: panel + operator posting to the API server.

Behavioral parity: reference blender_addon.py:93-290 — a bpy panel that
sends the active image (or text prompt) to the server's fire-and-forget
``POST /send`` endpoint, polls ``GET /status/{uid}``, and imports the
returned GLB when complete. Works against apps/api_server.py unchanged
(same JSON contract). Install this file as a Blender addon; it is inert
outside Blender (bpy import guarded).
"""

bl_info = {
    "name": "Hunyuan3D-2 TPU Generator",
    "author": "hunyuan3d2_tpu",
    "version": (1, 0, 0),
    "blender": (3, 0, 0),
    "location": "View3D > Sidebar > Hunyuan3D",
    "description": "Generate 3D assets from images via the hunyuan3d2_tpu API server",
    "category": "3D View",
}

import base64
import json
import os
import tempfile
import urllib.request

try:
    import bpy
except ImportError:  # outside Blender
    bpy = None


API_DEFAULT = "http://localhost:8081"


def _post(url, payload):
    data = json.dumps(payload).encode()
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as resp:
        return json.loads(resp.read())


if bpy is not None:

    class HY3DProperties(bpy.types.PropertyGroup):
        api_url: bpy.props.StringProperty(name="API URL", default=API_DEFAULT)
        image_path: bpy.props.StringProperty(name="Image", subtype="FILE_PATH")
        octree_resolution: bpy.props.IntProperty(name="Octree", default=256,
                                                 min=64, max=512)
        num_steps: bpy.props.IntProperty(name="Steps", default=5, min=1, max=100)
        guidance_scale: bpy.props.FloatProperty(name="Guidance", default=5.0)
        seed: bpy.props.IntProperty(name="Seed", default=1234)
        texture: bpy.props.BoolProperty(name="Texture", default=False)
        job_uid: bpy.props.StringProperty(default="")

    class HY3D_OT_generate(bpy.types.Operator):
        bl_idname = "hy3d.generate"
        bl_label = "Generate 3D asset"

        def execute(self, context):
            props = context.scene.hy3d
            with open(bpy.path.abspath(props.image_path), "rb") as fh:
                img_b64 = base64.b64encode(fh.read()).decode()
            payload = {
                "image": img_b64,
                "octree_resolution": props.octree_resolution,
                "num_inference_steps": props.num_steps,
                "guidance_scale": props.guidance_scale,
                "seed": props.seed,
                "texture": props.texture,
                "type": "glb",
            }
            out = _post(props.api_url + "/send", payload)
            props.job_uid = out["uid"]
            bpy.ops.wm.hy3d_poll()
            return {"FINISHED"}

    class HY3D_OT_poll(bpy.types.Operator):
        bl_idname = "wm.hy3d_poll"
        bl_label = "Poll Hunyuan3D job"
        _timer = None

        def modal(self, context, event):
            if event.type != "TIMER":
                return {"PASS_THROUGH"}
            props = context.scene.hy3d
            st = _get(props.api_url + "/status/" + props.job_uid)
            if st["status"] == "completed":
                glb = base64.b64decode(st["model_base64"])
                path = os.path.join(tempfile.gettempdir(),
                                    props.job_uid + ".glb")
                with open(path, "wb") as fh:
                    fh.write(glb)
                bpy.ops.import_scene.gltf(filepath=path)
                context.window_manager.event_timer_remove(self._timer)
                return {"FINISHED"}
            if st["status"] == "error":
                self.report({"ERROR"}, st.get("message", "generation failed"))
                context.window_manager.event_timer_remove(self._timer)
                return {"CANCELLED"}
            return {"RUNNING_MODAL"}

        def execute(self, context):
            self._timer = context.window_manager.event_timer_add(
                2.0, window=context.window)
            context.window_manager.modal_handler_add(self)
            return {"RUNNING_MODAL"}

    class HY3D_PT_panel(bpy.types.Panel):
        bl_label = "Hunyuan3D-2 TPU"
        bl_space_type = "VIEW_3D"
        bl_region_type = "UI"
        bl_category = "Hunyuan3D"

        def draw(self, context):
            props = context.scene.hy3d
            col = self.layout.column()
            for f in ("api_url", "image_path", "octree_resolution", "num_steps",
                      "guidance_scale", "seed", "texture"):
                col.prop(props, f)
            col.operator("hy3d.generate")

    _CLASSES = (HY3DProperties, HY3D_OT_generate, HY3D_OT_poll, HY3D_PT_panel)

    def register():
        for c in _CLASSES:
            bpy.utils.register_class(c)
        bpy.types.Scene.hy3d = bpy.props.PointerProperty(type=HY3DProperties)

    def unregister():
        for c in reversed(_CLASSES):
            bpy.utils.unregister_class(c)
        del bpy.types.Scene.hy3d
