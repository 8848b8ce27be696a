"""Scheduler math vs independently-computed references."""

import numpy as np

from hunyuan3d2_tpu.pipelines.paint_schedulers import (
    EulerAncestralDiscreteScheduler,
    LCMScheduler,
    rescale_zero_terminal_snr,
)
from hunyuan3d2_tpu.pipelines.schedulers import (
    ConsistencyFlowMatchEulerDiscreteScheduler,
    FlowMatchEulerDiscreteScheduler,
)


def test_flow_match_sigmas_default():
    s = FlowMatchEulerDiscreteScheduler()
    sig = s.make_sigmas(5)
    np.testing.assert_allclose(sig, [0.0, 0.25, 0.5, 0.75, 1.0, 1.0], atol=1e-7)
    # Euler integration of constant velocity v=1 from 0 must land on 1
    x = 0.0
    for i in range(5):
        x = s.step(x, 1.0, sig[i], sig[i + 1])
    np.testing.assert_allclose(x, 1.0, atol=1e-6)


def test_flow_match_shift_transform():
    s = FlowMatchEulerDiscreteScheduler(shift=3.0)
    sig = s.make_sigmas(3)
    raw = np.linspace(0, 1, 3)
    ref = 3.0 * raw / (1 + 2.0 * raw)
    np.testing.assert_allclose(sig[:3], ref, atol=1e-7)


def test_consistency_sigmas_subset():
    s = ConsistencyFlowMatchEulerDiscreteScheduler(pcm_timesteps=50)
    sig = s.make_sigmas(5)
    assert len(sig) == 6
    assert sig[0] == 0.0 and sig[-1] == 1.0
    assert np.all(np.diff(sig) >= 0)


def test_ztsnr_terminal_alpha_zero():
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000) ** 2
    rb = rescale_zero_terminal_snr(betas)
    ac = np.cumprod(1 - rb)
    assert abs(np.sqrt(ac[-1])) < 1e-6          # SNR(T) == 0
    np.testing.assert_allclose(rb[0], betas[0], atol=1e-6)


def test_euler_ancestral_tables_and_step():
    s = EulerAncestralDiscreteScheduler()
    timesteps, sigmas = s.make_tables(30)
    assert len(timesteps) == 30 and len(sigmas) == 31
    assert timesteps[0] == 999.0 and sigmas[-1] == 0.0
    assert np.all(np.diff(sigmas) <= 0)
    # v-pred x0 identity: for v = (x - x0·sqrt(a))/..., check the closed form
    # against the alternate parameterization x0 = (x - σ·ε)/1 with
    # ε = (v + σ·x/(σ²+1)·...)— use the simplest invariant instead:
    # at σ→0 the predicted x0 must approach the sample.
    x = np.ones((2, 2), np.float32)
    v = np.full((2, 2), 0.3, np.float32)
    _, x0 = s.step(v, x, sigma=1e-4, sigma_next=0.0, noise=np.zeros_like(x))
    np.testing.assert_allclose(x0, x, atol=1e-3)
    # ancestral noise magnitude: sigma_up² + sigma_down² = sigma_next²
    sf, st = 2.0, 1.0
    up2 = st ** 2 * (sf ** 2 - st ** 2) / sf ** 2
    down = np.sqrt(st ** 2 - up2)
    assert abs(up2 + down ** 2 - st ** 2) < 1e-12


def test_lcm_tables():
    s = LCMScheduler()
    timesteps, ac = s.make_tables(5)
    assert len(timesteps) == 5
    assert np.all(np.diff(timesteps) < 0)
    assert len(ac) == 1000


def test_lcm_turbo_timesteps_match_reference():
    """Reference turbo schedule (hunyuanpaint/pipeline.py:219-223, 598-603):
    DDIMSolver(ddim_timesteps=30) → step_ratio 33, table (i+1)*33-1, indexed
    by torch.range(29, 0, -3) → exactly these 10 timesteps."""
    timesteps, _ = LCMScheduler().make_tables(10)
    np.testing.assert_array_equal(
        timesteps.astype(np.int64),
        [989, 890, 791, 692, 593, 494, 395, 296, 197, 98])


def test_consistency_sigmas_match_reference_indexing():
    """PCM discrete grid (reference schedulers.py:340-349): indices
    [0, round(i·T/pcm)−1 …] into linspace(0,1,T); inference subset
    floor(linspace(0, pcm, N, endpoint=False)) — incl. non-divisor N."""
    import numpy as np

    from hunyuan3d2_tpu.pipelines.schedulers import (
        ConsistencyFlowMatchEulerDiscreteScheduler,
    )

    sched = ConsistencyFlowMatchEulerDiscreteScheduler()
    T, pcm = 1000, 50
    full = np.linspace(0, 1, T)
    euler_idx = np.asarray(
        [0] + ((np.arange(1, pcm) * (T // pcm)).round().astype(np.int64) - 1).tolist())
    discrete = full[euler_idx]
    for n in (1, 5, 7, 30, 50):
        want_idx = np.floor(np.linspace(0, pcm, num=n, endpoint=False)).astype(np.int64)
        want = np.concatenate([discrete[want_idx], [1.0]]).astype(np.float32)
        got = sched.make_sigmas(n)
        np.testing.assert_allclose(got, want, atol=1e-7)
    # spot values: sigma[1] at N=5 is linspace(0,1,1000)[199] = 199/999
    got5 = sched.make_sigmas(5)
    np.testing.assert_allclose(got5[1], 199 / 999, atol=1e-7)
