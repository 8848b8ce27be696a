"""Multiview diffusion wrapper.

Behavioral parity: reference hy3dgen/texgen/utils/multiview_utils.py:26-97
(Multiview_Diffusion_Net): loads HunyuanPaint, swaps the scheduler
(EulerAncestral standard / LCM+set_turbo for turbo), resizes inputs to the
512² view size, packs normal+position control maps and camera_info into the
pipeline call, seeds everything to 0.
"""

from __future__ import annotations

from typing import List

import jax


class Multiview_Diffusion_Net:
    def __init__(self, config):
        self.view_size = 512
        self.num_inference_steps = 30
        from hunyuan3d2_tpu.io import checkpoints

        self.pipeline = checkpoints.load_paint_pipeline(
            config.multiview_ckpt_path, view_size=self.view_size)
        if config.pipe_name == "hunyuanpaint-turbo":
            self.pipeline.set_turbo(True)

    def __call__(self, input_images, control_images, camera_info: List[int],
                 output_type: str = "pil"):
        if not isinstance(input_images, list):
            input_images = [input_images]
        size = self.view_size
        input_images = [im.resize((size, size)) for im in input_images]
        if isinstance(control_images, tuple):
            # device path: (normal, position) uint8 [N, size, size, 3] jax
            # arrays straight from cond_maps_tpu — no host round trip
            normal_image, position_image = control_images
            num_view = normal_image.shape[0]
        else:
            control = []
            for im in control_images:
                im = im.resize((size, size))
                if im.mode == "L":
                    im = im.point(lambda x: 255 if x > 1 else 0, mode="1")
                control.append(im)

            num_view = len(control) // 2
            normal_image = [[control[i] for i in range(num_view)]]
            position_image = [[control[i + num_view] for i in range(num_view)]]

        result = self.pipeline(
            input_images,
            width=size, height=size,
            num_in_batch=num_view,
            camera_info_gen=[camera_info],
            camera_info_ref=[[0]],
            normal_imgs=normal_image,
            position_imgs=position_image,
            num_inference_steps=self.num_inference_steps,
            key=jax.random.PRNGKey(0),   # seeded to 0 (parity :53-63)
            output_type=output_type,
        )
        return result.images
