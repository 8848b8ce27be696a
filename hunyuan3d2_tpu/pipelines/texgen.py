"""Texture-generation pipeline: mesh + image → textured mesh.

Behavioral parity: reference hy3dgen/texgen/pipelines.py —
Hunyuan3DTexGenConfig :35 (6 candidate cameras azims [0,90,180,270,0,180] /
elevs [0,0,0,0,90,-90], weights [1,.1,.5,.1,.05,.05], render 2048, texture
2048, bake_exp 4, merge 'fast') and Hunyuan3DPaintPipeline :59
(recenter :168-200 → mesh_uv_wrap :220 → render normal+position ×6 :227-230
→ camera_info index formula :232-234 → multiview diffusion :235 →
bake_from_multiview :141-159 → texture_inpaint :161-166 → save :250-252).
The delight and super-resolution stages are disabled in the reference fork
(:114-117, :238) and optional here (utils/dehighlight, utils/imagesuper).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from hunyuan3d2_tpu.geometry.render import MeshRender
from hunyuan3d2_tpu.geometry.uv import mesh_uv_wrap
from hunyuan3d2_tpu.utils.logger import get_logger
from hunyuan3d2_tpu.utils.timer import timed_scope

logger = get_logger("hunyuan3d2_tpu.texgen")


class Hunyuan3DTexGenConfig:
    """Parity: texgen/pipelines.py:35-56."""

    def __init__(self, light_remover_ckpt_path=None, multiview_ckpt_path=None,
                 subfolder_name: str = "hunyuan3d-paint-v2-0-turbo"):
        self.light_remover_ckpt_path = light_remover_ckpt_path
        self.multiview_ckpt_path = multiview_ckpt_path
        self.candidate_camera_azims = [0, 90, 180, 270, 0, 180]
        self.candidate_camera_elevs = [0, 0, 0, 0, 90, -90]
        self.candidate_view_weights = [1, 0.1, 0.5, 0.1, 0.05, 0.05]
        self.render_size = 2048
        self.texture_size = 2048
        self.bake_exp = 4
        self.merge_method = "fast"
        self.pipe_dict = {"hunyuan3d-paint-v2-0": "hunyuanpaint",
                          "hunyuan3d-paint-v2-0-turbo": "hunyuanpaint-turbo"}
        self.pipe_name = self.pipe_dict.get(subfolder_name, "hunyuanpaint")


def camera_info_index(azim: int, elev: int) -> int:
    """Camera-index formula (parity: texgen/pipelines.py:232-234)."""
    div = {-20: 1, 0: 1, 20: 1, -90: 3, 90: 3}[elev]
    off = {-20: 0, 0: 12, 20: 24, -90: 36, 90: 40}[elev]
    return (((azim // 30) + 9) % 12) // div + off


class Hunyuan3DPaintPipeline:
    """mesh + image → textured mesh (parity: texgen/pipelines.py:59-253)."""

    def __init__(self, models: dict, config: Optional[Hunyuan3DTexGenConfig] = None):
        self.config = config or Hunyuan3DTexGenConfig()
        self.models = models  # {'multiview_model': callable, ...}
        self.render = MeshRender(
            default_resolution=self.config.render_size,
            texture_size=self.config.texture_size)

    def shard(self, mesh=None):
        """Distribute the inner diffusion stack over a device `Mesh`
        (see HunyuanPaintPipeline.shard)."""
        self.models["multiview_model"].pipeline.shard(mesh)
        return self

    # -- constructors -------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, model_path: str,
                        subfolder: str = "hunyuan3d-paint-v2-0-turbo", **kwargs):
        from hunyuan3d2_tpu.pipelines.multiview import Multiview_Diffusion_Net

        config = Hunyuan3DTexGenConfig(multiview_ckpt_path=model_path,
                                       subfolder_name=subfolder)
        return cls({"multiview_model": Multiview_Diffusion_Net(config)}, config)

    @classmethod
    def init_random(cls, key=None, size: str = "tiny", view_size: int = 64,
                    render_size: int = 256, texture_size: int = 256,
                    num_inference_steps: int = 30):
        """Random-weight paint stack for tests/benchmarks."""
        from hunyuan3d2_tpu.pipelines.hunyuanpaint import HunyuanPaintPipeline
        from hunyuan3d2_tpu.pipelines.multiview import Multiview_Diffusion_Net

        config = Hunyuan3DTexGenConfig()
        config.render_size = render_size
        config.texture_size = texture_size
        inner = HunyuanPaintPipeline.init_random(key, size=size, view_size=view_size)
        mv = Multiview_Diffusion_Net.__new__(Multiview_Diffusion_Net)
        mv.pipeline = inner
        mv.view_size = view_size
        mv.num_inference_steps = num_inference_steps
        return cls({"multiview_model": mv}, config)

    # -- stages ---------------------------------------------------------------------
    def recenter_image(self, image, border_ratio: float = 0.2):
        """Parity: texgen/pipelines.py:168-200 — crop to the alpha bbox, pad
        each side by border_ratio of the cropped dim, paste centered on a
        square transparent canvas (no resampling)."""
        from PIL import Image

        if not isinstance(image, Image.Image):
            image = Image.fromarray(np.asarray(image))
        if image.mode == "RGB":
            return image
        if image.mode == "L":
            return image.convert("RGB")
        image = image.convert("RGBA")

        alpha = np.asarray(image)[:, :, 3]
        nz = np.argwhere(alpha > 0)
        if nz.size == 0:
            raise ValueError("Image is fully transparent")
        min_row, min_col = nz.min(axis=0)
        max_row, max_col = nz.max(axis=0)
        cropped = image.crop((min_col, min_row, max_col + 1, max_row + 1))
        width, height = cropped.size
        bw, bh = int(width * border_ratio), int(height * border_ratio)
        square = max(width + 2 * bw, height + 2 * bh)
        canvas = Image.new("RGBA", (square, square), (255, 255, 255, 0))
        canvas.paste(cropped, ((square - width - 2 * bw) // 2 + bw,
                               (square - height - 2 * bh) // 2 + bh))
        return canvas

    def render_normal_multiview(self, camera_elevs, camera_azims,
                                use_abs_coor=True, resolution=None):
        from PIL import Image

        out = []
        for elev, azim in zip(camera_elevs, camera_azims):
            nm = self.render.render_normal(elev, azim, use_abs_coor=use_abs_coor,
                                           resolution=resolution, return_type="np")
            out.append(Image.fromarray(
                (np.clip(nm[..., :3], 0, 1) * 255).astype(np.uint8)))
        return out

    def render_position_multiview(self, camera_elevs, camera_azims,
                                  resolution=None):
        from PIL import Image

        out = []
        for elev, azim in zip(camera_elevs, camera_azims):
            pm = self.render.render_position(elev, azim, resolution=resolution,
                                             return_type="np")
            out.append(Image.fromarray(
                (np.clip(pm[..., :3], 0, 1) * 255).astype(np.uint8)))
        return out

    def bake_from_multiview(self, views, camera_elevs, camera_azims, view_weights,
                            method: str = "fast"):
        """Parity: texgen/pipelines.py:141-159. Uses the fused incremental
        merge (identical math to back_project×N → fast_bake_texture, without
        retaining per-view full-res maps)."""
        if method == "fast":
            return self.render.bake_texture_fused(
                views, camera_elevs, camera_azims,
                exp=self.config.bake_exp, weights=list(view_weights))
        raise ValueError(f"no method {method}")

    def texture_inpaint(self, texture: np.ndarray, mask: np.ndarray):
        """Parity: texgen/pipelines.py:161-166."""
        return self.render.uv_inpaint(texture, mask)

    def _call_device(self, mesh, images_prompt, elevs, azims, weights):
        """Fully device-resident texture stage (TPU): cond-map renders, the
        diffusion denoise, and the texture bake all run on the chip via the
        Pallas rasterizer (geometry/render_tpu.py) — the only texture-sized
        host transfer is the final baked atlas. Returns ``(out, wrapped)``
        where ``out`` is None (→ host path) off-TPU, for per-corner-UV
        meshes, or when HY3D_DEVICE_BAKE=0, and ``wrapped`` is the
        UV-unwrapped mesh if the unwrap already ran (so the host fallback
        never unwraps twice). HY3D_DEVICE_BAKE=force runs it on any backend
        (CPU tests exercise the full path through the Pallas interpreter).

        The host UV unwrap (~2-3 s at 40k faces) is color-independent, so it
        runs WHILE the dispatched diffusion denoises on the chip: cond maps
        only need positions/normals (uploaded from the raw mesh — the unwrap
        splits seam vertices but never moves them, so the auto_center
        transform and the rendered geometry are identical), and only the
        bake consumes UVs."""
        import os

        import jax

        flag = os.environ.get("HY3D_DEVICE_BAKE", "1")
        if flag not in ("1", "force"):
            return None, None
        if flag != "force" and jax.default_backend() != "tpu":
            return None, None
        from hunyuan3d2_tpu.geometry.render_tpu import (
            bake_tpu_prepared,
            check_prepared_overflow,
            cond_maps_tpu,
            prepare_bake_tpu,
            upload_mesh,
        )

        # pre-unwrapped input: the unwrap below is a no-op, so resolve the
        # UV-upload gate BEFORE dispatching the diffusion — a per-corner-UV
        # mesh must degrade to the host path without paying a wasted device
        # denoise (and doubling HBM pressure with the host path's re-dispatch)
        if getattr(mesh, "uv", None) is not None:
            pre = mesh_uv_wrap(mesh)
            self.render.load_mesh(pre)
            if upload_mesh(self.render, need_uv=True) is None:
                return None, pre

        # phase 1: geometry-only upload of the RAW mesh for the cond maps
        self.render.load_mesh(mesh)
        dev_geo = upload_mesh(self.render)
        import jax.numpy as jnp

        mvs = np.stack([self.render._mvp(e, a)[0]
                        for e, a in zip(elevs, azims)]).astype(np.float32)
        mvps = np.stack([self.render._mvp(e, a)[1]
                         for e, a in zip(elevs, azims)]).astype(np.float32)
        mvps_d = jnp.asarray(mvps)
        cond_res = getattr(self.models["multiview_model"], "view_size", 512)
        # the remote runtime dispatches asynchronously and holds workspaces
        # of queued executions; a scalar download between dispatch groups
        # bounds the transient HBM peak (one ~25 ms round trip each)
        def _sync(x):
            np.asarray(x.ravel()[0])

        with timed_scope("Cond Maps (device)"):
            normal_dev, position_dev = cond_maps_tpu(dev_geo, mvps_d,
                                                     cond_res)
            _sync(normal_dev)
        camera_info = [camera_info_index(azim, elev)
                       for azim, elev in zip(azims, elevs)]
        # dispatch the diffusion FIRST (async) ...
        import time as _time

        t_disp = _time.perf_counter()
        with timed_scope("Multiview Diffusion (dispatch)"):
            device_views = self.models["multiview_model"](
                images_prompt, (normal_dev, position_dev), camera_info,
                output_type="device")
        # window-end probe: a one-element slice enqueued IMMEDIATELY after
        # the diffusion programs, with its host copy started async. The copy
        # completes when the diffusion finishes — unlike a download issued
        # after the phase-A dispatch below, it does not queue behind the
        # overlapped bake programs, so the recorded window stays the
        # diffusion-only dispatch→ready wall (verified by a 40-vs-160 matmul
        # chain ordering probe; block_until_ready is unreliable over axon)
        probe = jax.tree_util.tree_leaves(device_views)[0].ravel()[0:1]
        try:
            probe.copy_to_host_async()
        except Exception:
            pass
        # ... and unwrap on the host while the chip denoises
        with timed_scope("UV Unwrap (overlaps denoise)"):
            wrapped = mesh_uv_wrap(mesh)
        self.render.load_mesh(wrapped)
        dev_mesh = upload_mesh(self.render, need_uv=True)
        if dev_mesh is None:
            # per-corner UVs → host back-project fallback (rare; the
            # dispatched diffusion is re-run there)
            return None, wrapped
        # production resolutions (VERDICT r4 #4): the bake raster runs at the
        # full render_size (reference texgen/pipelines.py:50 renders 2048)
        # and the diffusion views are sampled through a render_size-matched
        # upsample (the reference resizes views to render_size before the
        # splat, mesh_render.py:782). Both phases are tile-/view-chunked on
        # device, so 2048 stays VMEM-safe; HY3D_BAKE_RASTER / HY3D_BAKE_UPRES
        # override for tuning.
        view_size = getattr(self.models["multiview_model"], "view_size", 512)
        bake_raster = int(os.environ.get(
            "HY3D_BAKE_RASTER", max(self.render.default_resolution)))
        up_res = int(os.environ.get(
            "HY3D_BAKE_UPRES",
            min(max(self.render.default_resolution), 4 * view_size)))
        # bake phase A (UV geometry + per-view weight/index maps) is
        # color-independent, so it DISPATCHES behind the running denoise
        # (the device runs one stream in order, so execution doesn't
        # overlap, but the ~6 program dispatches + their transfers ride the
        # tunnel while the denoise computes, and the deferred overflow
        # check avoids blocking the host). HY3D_BAKE_OVERLAP=0 restores
        # the fully serialized order.
        overlap = os.environ.get("HY3D_BAKE_OVERLAP", "1") == "1"
        geom = None
        if overlap:
            with timed_scope("Bake Geometry (dispatch)"):
                geom = prepare_bake_tpu(
                    dev_mesh, jnp.asarray(mvs), mvps_d,
                    jnp.asarray(weights, jnp.float32), render_res=bake_raster,
                    tex_res=self.render.texture_size[0], up_res=up_res,
                    exp=float(self.config.bake_exp), check=False)
        with timed_scope("Multiview Diffusion (device)"):
            np.asarray(probe)
        # dispatch→ready wall window of the whole diffusion stage (control
        # VAE encodes + denoise scan + per-view VAE decode), INCLUDING the
        # part hidden under the UV unwrap — the bench's MFU denominator.
        # Ends at the async probe, NOT a fresh download (which would queue
        # behind the overlapped phase-A bake programs and absorb their time)
        from hunyuan3d2_tpu.utils.timer import LAST_TIMINGS

        LAST_TIMINGS["Diffusion Window (device)"] = (
            _time.perf_counter() - t_disp)
        del normal_dev, position_dev   # free HBM before the bake
        with timed_scope("Bake Geometry (device)"):
            if geom is None:
                geom = prepare_bake_tpu(
                    dev_mesh, jnp.asarray(mvs), mvps_d,
                    jnp.asarray(weights, jnp.float32), render_res=bake_raster,
                    tex_res=self.render.texture_size[0], up_res=up_res,
                    exp=float(self.config.bake_exp))
            else:
                geom = check_prepared_overflow(geom)
            _sync(geom[-1][0])
        with timed_scope("Texture Baking (device)"):
            texture_d, trust_d = bake_tpu_prepared(
                geom, device_views, self.render.texture_size[0],
                up_res=up_res)
            # quantize ON DEVICE and ship ONE u8 buffer: atlas (12 MB) +
            # bit-packed trust mask (0.5 MB) instead of 66 MB of fp32 (or
            # 16 MB of u8 + bool) over the ~22 MB/s tunnel — the mask is
            # 1 bit of information per texel
            tres = self.render.texture_size[0]
            tex_u8 = jnp.round(jnp.clip(texture_d, 0.0, 1.0)
                               * 255.0).astype(jnp.uint8)
            assert tres % 8 == 0, tres  # texture sizes are powers of two
            maskb = (trust_d > 1e-8).reshape(tres, tres // 8, 8)
            mask_packed = jnp.sum(
                maskb.astype(jnp.uint8)
                << jnp.arange(7, -1, -1, dtype=jnp.uint8), axis=-1,
                dtype=jnp.uint8)
            wire = np.asarray(jnp.concatenate(
                [tex_u8.reshape(-1), mask_packed.reshape(-1)]))
            texture = (wire[: tres * tres * 3].reshape(tres, tres, 3)
                       .astype(np.float32) / 255.0)
            mask = np.unpackbits(
                wire[tres * tres * 3:]).reshape(tres, tres).astype(bool)
        mask_np = (mask * 255).astype(np.uint8)
        with timed_scope("Texture Inpaint"):
            texture = self.texture_inpaint(texture, mask_np)
        self.render.set_texture(texture)
        return self.render.save_mesh(), wrapped

    # -- main ------------------------------------------------------------------------
    def __call__(self, mesh, image):
        if not isinstance(image, list):
            image = [image]
        from PIL import Image

        images_prompt = [Image.open(im) if isinstance(im, str) else im
                         for im in image]
        images_prompt = [self.recenter_image(im) for im in images_prompt]

        elevs = self.config.candidate_camera_elevs
        azims = self.config.candidate_camera_azims
        weights = self.config.candidate_view_weights

        wrapped = None
        try:
            device_out, wrapped = self._call_device(
                mesh, images_prompt, elevs, azims, weights)
        except Exception as e:  # OOM etc. — degrade to the host bake path
            import gc
            import time
            import traceback

            logger.warning("device texture path failed (%s); falling back "
                           "to the host bake\n%s", type(e).__name__,
                           traceback.format_exc())
            device_out = None
            # give the (possibly shared) device a moment to release the
            # failed attempt's buffers before re-dispatching the diffusion
            gc.collect()
            time.sleep(5.0)
        if device_out is not None:
            return device_out

        # host path: needs the unwrapped mesh in the render (the device path
        # may have unwrapped already — never unwrap twice)
        if wrapped is None:
            with timed_scope("UV Unwrap"):
                wrapped = mesh_uv_wrap(mesh)
        mesh = wrapped
        self.render.load_mesh(mesh)

        # render the control maps at the diffusion view size directly (the
        # reference renders at 2048 then downsizes to 512 — same information,
        # 16× less single-core raster/interp work)
        cond_res = getattr(self.models["multiview_model"], "view_size", 512)
        with timed_scope("Render Cond Maps"):
            # fused raster+interp: one pass per view for normal AND position
            normal_maps, position_maps = [], []
            for elev, azim in zip(elevs, azims):
                nm, pm = self.render.render_normal_position(
                    elev, azim, resolution=cond_res)
                normal_maps.append(Image.fromarray(
                    (np.clip(nm[..., :3], 0, 1) * 255).astype(np.uint8)))
                position_maps.append(Image.fromarray(
                    (np.clip(pm[..., :3], 0, 1) * 255).astype(np.uint8)))

        camera_info = [camera_info_index(azim, elev)
                       for azim, elev in zip(azims, elevs)]

        # Overlap host and TPU: the diffusion dispatch is async, so the
        # color-independent bake geometry (per-view raster + reliability
        # masks at render_size) is computed WHILE the UNet denoises; only
        # fetching the uint8 views blocks. The views are then splatted at
        # their native size (the kernel samples them at raster scale — the
        # reference's 512→2048 upsample never materializes).
        overlap = self.config.merge_method == "fast"
        if overlap:
            with timed_scope("Multiview Diffusion (dispatch)"):
                device_views = self.models["multiview_model"](
                    images_prompt, normal_maps + position_maps, camera_info,
                    output_type="device")
            with timed_scope("Bake Geometry (overlaps denoise)"):
                geometry = self.render.prepare_bake_geometry(elevs, azims)
            if geometry is not None:
                with timed_scope("Multiview Fetch"):
                    views_u8 = np.asarray(device_views)
                with timed_scope("Texture Baking"):
                    texture, mask = self.render.bake_texture_prepared(
                        views_u8, geometry, exp=self.config.bake_exp,
                        weights=list(weights))
            else:
                # per-corner UVs: fall back to the full-res fused path
                views_u8 = np.asarray(device_views)
                multiviews = [
                    Image.fromarray(v).resize(
                        (self.config.render_size, self.config.render_size))
                    for v in views_u8]
                with timed_scope("Texture Baking"):
                    texture, mask = self.bake_from_multiview(
                        multiviews, elevs, azims, weights,
                        method=self.config.merge_method)
        else:
            with timed_scope("Multiview Diffusion"):
                multiviews = self.models["multiview_model"](
                    images_prompt, normal_maps + position_maps, camera_info)
            multiviews = [
                mv.resize((self.config.render_size, self.config.render_size))
                for mv in multiviews]
            with timed_scope("Texture Baking"):
                texture, mask = self.bake_from_multiview(
                    multiviews, elevs, azims, weights,
                    method=self.config.merge_method)
        mask_np = (mask[..., 0] * 255).astype(np.uint8)

        with timed_scope("Texture Inpaint"):
            texture = self.texture_inpaint(texture, mask_np)

        self.render.set_texture(texture)
        return self.render.save_mesh()
