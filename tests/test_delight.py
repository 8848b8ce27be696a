"""JAX-native delight (InstructPix2Pix) pipeline tests.

Parity target: reference hy3dgen/texgen/utils/dehighlight_utils.py
Light_Shadow_Remover — IP2P triple-CFG EulerAncestral sampling + RGB
recorrection + alpha compositing. Random weights at tiny config (the
diffusion math and plumbing are identical at any scale)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
from PIL import Image

from hunyuan3d2_tpu.pipelines.delight import (
    IP2P_SCHEDULER,
    DelightPipeline,
)


def test_ip2p_scheduler_leading_tables():
    """SD1.5 'leading' spacing: step ratio 20, ascending grid + offset 1,
    reversed (diffusers EulerAncestralDiscreteScheduler.set_timesteps)."""
    timesteps, sigmas = IP2P_SCHEDULER.make_tables(50)
    assert len(timesteps) == 50 and len(sigmas) == 51
    assert timesteps[0] == 981.0 and timesteps[-1] == 1.0
    assert np.all(np.diff(timesteps) == -20.0)
    assert sigmas[-1] == 0.0 and np.all(np.diff(sigmas[:-1]) < 0)
    # epsilon prediction + no zero-SNR rescale: finite max sigma well below
    # the ZTSNR blowup (~4096)
    assert 10 < sigmas[0] < 200


def test_delight_pipeline_runs_and_is_deterministic():
    pipe = DelightPipeline.init_random(size="tiny", resolution=32,
                                       num_inference_steps=3)
    rgb = np.random.RandomState(0).rand(48, 40, 3).astype(np.float32)
    out1 = pipe(rgb, seed=42)
    out2 = pipe(rgb, seed=42)
    assert out1.shape == rgb.shape
    assert np.isfinite(out1).all()
    assert (out1 >= 0).all() and (out1 <= 1).all()
    np.testing.assert_array_equal(out1, out2)
    # a different seed draws different initial noise
    assert np.abs(pipe(rgb, seed=7) - out1).max() > 1e-4


def test_light_shadow_remover_uses_injected_jax_pipeline():
    from hunyuan3d2_tpu.utils.dehighlight import Light_Shadow_Remover

    pipe = DelightPipeline.init_random(size="tiny", resolution=32,
                                       num_inference_steps=2)
    lsr = Light_Shadow_Remover(pipeline=pipe)
    arr = np.zeros((64, 64, 4), np.uint8)
    arr[16:48, 16:48] = [180, 90, 60, 255]
    out = lsr(Image.fromarray(arr))
    assert out.size == (64, 64)
    a = np.asarray(out)
    # background (alpha=0) must composite to white (reference __call__ tail)
    assert (a[:8, :8] == 255).all()
